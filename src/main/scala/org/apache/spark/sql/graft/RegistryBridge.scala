package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session function-registry access for eKuiper-named SQL functions
  * (GraftFunctions). Registration goes through the Catalyst
  * FunctionRegistry — the functions stay Expression builders, so SQL
  * using them compiles to codegen'd built-ins, not UDF call sites.
  */
object RegistryBridge {
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply a configured SparkSessionExtensions' injected functions to
    * an existing session (test hook for GraftExtensions; production
    * sessions get this automatically via spark.sql.extensions).
    */
  def applyExtensions(ext: org.apache.spark.sql.SparkSessionExtensions,
                      spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
}
