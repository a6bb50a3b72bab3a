package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Projection/residual kernels for [[graft.operators.Pca]]: the fitted
  * mean and components ride into the generated code as referenced
  * objects (dim×k doubles — a plan literal would re-serialize them
  * into every task binary), so corpus-wide projection is one codegen
  * loop per row. Works over any numeric array column via the
  * [[VectorKernels.toDoubles]] element-code dispatch.
  */
object PcaKernels {

  /** Centered projections onto the k components: comps is k×dim. */
  def project(vec: ArrayData, elem: Int, mean: Array[Double],
      comps: Array[Array[Double]]): ArrayData = {
    val v = VectorKernels.toDoubles(vec, elem)
    val out = new Array[Double](comps.length)
    var c = 0
    while (c < comps.length) {
      val comp = comps(c)
      var s = 0.0
      var i = 0
      val len = math.min(v.length, comp.length)
      while (i < len) { s += (v(i) - mean(i)) * comp(i); i += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Squared residual of the rank-k reconstruction. With orthonormal
    * components this is ||x − μ||² − Σ projᵢ² (no need to materialize
    * the reconstruction).
    */
  def residual(vec: ArrayData, elem: Int, mean: Array[Double],
      comps: Array[Array[Double]]): Double = {
    val v = VectorKernels.toDoubles(vec, elem)
    var norm = 0.0
    var i = 0
    val len = math.min(v.length, mean.length)
    while (i < len) { val d = v(i) - mean(i); norm += d * d; i += 1 }
    var c = 0
    while (c < comps.length) {
      val comp = comps(c)
      var s = 0.0
      i = 0
      while (i < len) { s += (v(i) - mean(i)) * comp(i); i += 1 }
      norm -= s * s
      c += 1
    }
    math.max(norm, 0.0)
  }
}

case class PcaProjectExpr(child: Expression, mean: Array[Double],
    comps: Array[Array[Double]]) extends UnaryExpression {
  private lazy val elem = VectorElem.code(child, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"
  override protected def nullSafeEval(input: Any): Any =
    PcaKernels.project(input.asInstanceOf[ArrayData], elem, mean, comps)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val c = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.PcaKernels.project($in, $elem, $m, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

case class PcaResidualExpr(child: Expression, mean: Array[Double],
    comps: Array[Array[Double]]) extends UnaryExpression {
  private lazy val elem = VectorElem.code(child, prettyName)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pca_residual"
  override protected def nullSafeEval(input: Any): Any =
    PcaKernels.residual(input.asInstanceOf[ArrayData], elem, mean, comps)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val c = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.PcaKernels.residual($in, $elem, $m, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaResidualExpr =
    copy(child = newChild)
}

object PcaFunctions {
  def pca_project(vec: Column, mean: Array[Double], comps: Array[Array[Double]]): Column =
    ColumnBridge.column(PcaProjectExpr(ColumnBridge.expression(vec), mean, comps))
  def pca_residual(vec: Column, mean: Array[Double], comps: Array[Array[Double]]): Column =
    ColumnBridge.column(PcaResidualExpr(ColumnBridge.expression(vec), mean, comps))
}
