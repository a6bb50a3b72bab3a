package graft.plugins

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graft.RegistryBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** JavaScript script functions (reference internal/plugin/js: goja
  * scripts registered via `/udf/javascript`, each mapped to a SQL
  * function named after its id; aggregate scripts receive each
  * argument as the group's value ARRAY). graft runs them on
  * [[MiniJs]] and registers an Expression builder per script, so a
  * registered JS function is callable from rule SQL exactly like a
  * built-in.
  *
  * Deviation forced by a typed engine: eKuiper is dynamically typed
  * end-to-end, so a goja result needs no declared type; Catalyst
  * needs one. Scripts carry an optional `resultType`
  * (string|double|bigint|boolean, default string) — JSON-stringified
  * for structured results under `string`.
  */
final case class JsScript(id: String, description: String = "",
                          script: String = "", isAgg: Boolean = false,
                          resultType: String = "string") {
  require(Seq("string", "double", "bigint", "boolean").contains(resultType),
    s"unsupported resultType '$resultType'")
  def dataType: DataType = resultType match {
    case "double" => DoubleType
    case "bigint" => LongType
    case "boolean" => BooleanType
    case _ => StringType
  }
}

object JsFunctions {
  private val scripts = new ConcurrentHashMap[String, JsScript]()

  /** Parse + run the script and check the id names a function — the
    * reference's validate() (manager.go:76-86).
    */
  def validate(s: JsScript): Unit = {
    val program =
      try MiniJs.load(s.script)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"failed to interprete script: ${e.getMessage}")
      }
    if (program.function(s.id).isEmpty)
      throw new IllegalArgumentException(s"""cannot find function "${s.id}" in script""")
  }

  /** Create (errors if the id exists — the reference's Setnx). */
  def create(spark: SparkSession, s: JsScript): Unit = {
    validate(s)
    if (scripts.putIfAbsent(s.id, s) != null)
      throw new IllegalArgumentException(s"script ${s.id} already exists")
    register(spark, s)
  }

  /** Upsert (the reference's Update — also used by import). */
  def upsert(spark: SparkSession, s: JsScript): Unit = {
    validate(s)
    scripts.put(s.id, s)
    register(spark, s)
  }

  def get(id: String): Option[JsScript] = Option(scripts.get(id))

  def list(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    scripts.keys.asScala.toSeq.sorted
  }

  def delete(spark: SparkSession, id: String): Boolean = {
    val existed = scripts.remove(id) != null
    if (existed)
      // next SQL use fails at plan time, like the reference's
      // NewJSFunc failing on a deleted kv entry
      RegistryBridge.register(spark, id, _ =>
        throw new IllegalArgumentException(s"failed to get script for $id: not found"))
    existed
  }

  /** Test hook: forget everything (does not unregister from sessions). */
  def clear(): Unit = scripts.clear()

  /** Expose the script as a SQL function in this session. Aggregate
    * scripts wrap every argument in collect_list, so the JS function
    * sees the group's values as a JS array — the reference's isAgg
    * contract (script/overview.md "expect the parameters to be an
    * array").
    */
  def register(spark: SparkSession, s: JsScript): Unit =
    RegistryBridge.register(spark, s.id, args => {
      val children =
        if (s.isAgg) args.map(a => CollectList(a).toAggregateExpression())
        else args
      JsCallExpr(children, s.id, s.script, s.dataType,
        aggGroupCap = if (s.isAgg) MaxAggGroupSize else 0,
        pure = MiniJs.isPure(s.script))
    })

  /** Aggregate scripts materialize the WHOLE group as one JS array
    * (the reference's isAgg contract) — unbounded on a skewed key,
    * that is an executor OOM. Groups past this cap fail with a clear
    * error instead; raise it deliberately for genuinely huge groups,
    * or pre-aggregate in SQL.
    */
  @volatile var MaxAggGroupSize: Int = 1 << 20
}

/** Calls a named function in a MiniJs script per row (CodegenFallback:
  * the interpreter is the work; a codegen call boundary would not buy
  * anything). The program loads lazily ONCE per executor/thread from
  * the captured script text — no driver state is referenced, so the
  * expression ships cleanly to executors.
  */
case class JsCallExpr(children: Seq[Expression], scriptId: String,
                      script: String, dataType: DataType,
                      aggGroupCap: Int = 0, pure: Boolean = false)
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def prettyName: String = scriptId
  // Scripts can read Date.now() and mutate program-global state across
  // calls (the reference's goja runtime keeps per-instance state), so
  // by default Catalyst must not CSE, reorder, or constant-fold calls
  // away. Scripts that [[MiniJs.isPure]] proves stateless (functions
  // only, no Date/log, no non-local writes) keep determinism — but
  // only when every argument is itself deterministic (a pure script
  // over rand() is still nondeterministic end to end).
  override lazy val deterministic: Boolean =
    pure && children.forall(_.deterministic)

  @transient private lazy val fn: Seq[Any] => Any =
    MiniJs.load(script).function(scriptId).getOrElse(
      throw new IllegalStateException(s"""cannot find function "$scriptId" in script"""))

  private def toJs(dt: DataType, v: Any): Any =
    if (v == null) MiniJs.JsNull
    else dt match {
      case StringType => v.asInstanceOf[UTF8String].toString
      case ByteType | ShortType | IntegerType =>
        v.asInstanceOf[Number].doubleValue()
      case LongType => v.asInstanceOf[Long].toDouble
      case FloatType => v.asInstanceOf[Float].toDouble
      case DoubleType => v
      case BooleanType => v
      case d: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        new MiniJs.JsArr(mutable.ArrayBuffer.tabulate(a.numElements())(i =>
          toJs(et, a.get(i, et))))
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        val out = mutable.LinkedHashMap[String, Any]()
        var i = 0
        while (i < m.numElements()) {
          out(MiniJs.toJsString(toJs(kt, keys.get(i, kt)))) = toJs(vt, vals.get(i, vt))
          i += 1
        }
        new MiniJs.JsObj(out)
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val out = mutable.LinkedHashMap[String, Any]()
        st.fields.zipWithIndex.foreach { case (f, i) =>
          out(f.name) = toJs(f.dataType, row.get(i, f.dataType))
        }
        new MiniJs.JsObj(out)
      case TimestampType => v.asInstanceOf[Long].toDouble / 1000.0 // epoch ms, JS-style
      case _ => MiniJs.toJsString(UTF8String.fromString(String.valueOf(v)).toString)
    }

  override def eval(input: InternalRow): Any = {
    val args = children.map { c =>
      val v = c.eval(input)
      v match {
        // guard BEFORE materializing the group as a JS array
        case a: ArrayData if aggGroupCap > 0 && a.numElements() > aggGroupCap =>
          throw new RuntimeException(
            s"script $scriptId: aggregate group of ${a.numElements()} values exceeds " +
              s"the ${aggGroupCap}-value cap (JsFunctions.MaxAggGroupSize) — " +
              "pre-aggregate in SQL or raise the cap deliberately")
        case _ => ()
      }
      toJs(c.dataType, v)
    }
    val res =
      try fn(args)
      catch {
        case e: MiniJs.JsError =>
          // reference: JS exceptions are runtime errors for the rule
          throw new RuntimeException(s"script $scriptId threw: ${e.getMessage}")
      }
    dataType match {
      case StringType =>
        res match {
          case MiniJs.JsNull | MiniJs.JsUndefined => null
          case a: MiniJs.JsArr => UTF8String.fromString(MiniJs.stringify(a))
          case o: MiniJs.JsObj => UTF8String.fromString(MiniJs.stringify(o))
          case other => UTF8String.fromString(MiniJs.toJsString(other))
        }
      case DoubleType =>
        if (res == MiniJs.JsNull || res == MiniJs.JsUndefined) null
        else {
          val d = MiniJs.toNumber(res)
          // reference function.go: NaN / Inf results are errors
          if (d.isNaN) throw new RuntimeException("result is NaN")
          if (d.isInfinite) throw new RuntimeException("result is Inf")
          d
        }
      case LongType =>
        if (res == MiniJs.JsNull || res == MiniJs.JsUndefined) null
        else {
          val d = MiniJs.toNumber(res)
          if (d.isNaN) throw new RuntimeException("result is NaN")
          if (d.isInfinite) throw new RuntimeException("result is Inf")
          d.toLong
        }
      case BooleanType =>
        if (res == MiniJs.JsNull || res == MiniJs.JsUndefined) null
        else MiniJs.truthy(res)
      case other => throw new IllegalStateException(s"unsupported JS result type $other")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsCallExpr =
    copy(children = newChildren)
}
