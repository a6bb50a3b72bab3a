package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Vector kernels for the IVF ANN path: cosine cell assignment against
  * a (small, broadcast-as-literal) centroid table, in one tight loop
  * per row. Centroids are embedded in the generated code via
  * addReferenceObj, so assignment stays inside whole-stage codegen.
  */
object VectorKernels {

  /** Cosine similarity of a float vector against a unit-norm centroid. */
  private def cosToUnit(v: Array[Float], c: Array[Double]): Double = {
    var dot = 0.0; var n = 0.0; var i = 0
    val len = math.min(v.length, c.length)
    while (i < len) { dot += v(i) * c(i); n += v(i).toDouble * v(i); i += 1 }
    if (n == 0) 0.0 else dot / math.sqrt(n)
  }

  /** Index of the max-cosine centroid. */
  def argMaxCell(vec: ArrayData, cents: Array[Array[Double]]): Int = {
    val v = vec.toFloatArray()
    var best = 0; var bestS = Double.NegativeInfinity; var i = 0
    while (i < cents.length) {
      val s = cosToUnit(v, cents(i))
      if (s > bestS) { bestS = s; best = i }
      i += 1
    }
    best
  }

  /** The p highest-cosine cells, best first. */
  def topCells(vec: ArrayData, cents: Array[Array[Double]], p: Int): ArrayData = {
    val v = vec.toFloatArray()
    val scored = Array.tabulate(cents.length)(i => (cosToUnit(v, cents(i)), i))
    val top = scored.sortBy { case (s, i) => (-s, i) }.take(math.min(p, cents.length))
    new GenericArrayData(top.map(_._2))
  }
}

case class IvfCellExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.argMaxCell(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.argMaxCell($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfCellExpr =
    copy(child = newChild)
}

case class IvfProbeCellsExpr(child: Expression, centroids: Array[Array[Double]], p: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe_cells"
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.topCells(input.asInstanceOf[ArrayData], centroids, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.topCells($c, $ref, $p)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfProbeCellsExpr =
    copy(child = newChild)
}

object VectorFunctions {
  def ivf_cell(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(IvfCellExpr(ColumnBridge.expression(vec), centroids))
  def ivf_probe_cells(vec: Column, centroids: Array[Array[Double]], p: Int): Column =
    ColumnBridge.column(IvfProbeCellsExpr(ColumnBridge.expression(vec), centroids, p))
}
