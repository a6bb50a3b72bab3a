package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  // Element-type codes resolved at plan time and spliced into the
  // generated call as constants (see VectorElem).
  final val ElemFloat = 0
  final val ElemDouble = 1
  final val ElemInt = 2
  final val ElemLong = 3
  final val ElemShort = 4
  final val ElemByte = 5

  /** Widen an array column's data to double[] for any numeric element
    * type. The code is resolved at plan time from the column's element
    * type and spliced into the generated call as a constant.
    */
  def toDoubles(a: ArrayData, elem: Int): Array[Double] = elem match {
    case ElemFloat =>
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    case ElemDouble => a.toDoubleArray()
    case ElemInt =>
      val v = a.toIntArray()
      val out = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
      out
    case ElemLong =>
      val v = a.toLongArray()
      val out = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
      out
    case ElemShort =>
      val v = a.toShortArray()
      val out = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
      out
    case ElemByte =>
      val v = a.toByteArray()
      val out = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
      out
  }

  /** Cosine similarity in one tight loop. Fold order (dot ascending,
    * then |a|², then |b|²) matches the interpreted HOF formulation it
    * replaced bit-for-bit, so oracle-pinned results are unchanged.
    */
  def cosineSim(a: ArrayData, aElem: Int, b: ArrayData, bElem: Int): Double = {
    val va = toDoubles(a, aElem)
    val vb = toDoubles(b, bElem)
    if (va.length != vb.length)
      throw new IllegalArgumentException(
        s"cosine: vectors must have equal length (${va.length} vs ${vb.length})")
    var dot = 0.0
    var i = 0
    while (i < va.length) { dot += va(i) * vb(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < va.length) { na += va(i) * va(i); i += 1 }
    var nb = 0.0
    i = 0
    while (i < vb.length) { nb += vb(i) * vb(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127,
    * byte_i = round(x_i/scale). Cosine is invariant under positive
    * per-vector scaling, so int8 cosine needs no dequantization and no
    * stored scale — a 4× smaller embedding column for the ANN scan
    * path (the memory/bandwidth trade every production vector store
    * makes).
    */
  def quantizeInt8(a: ArrayData, elem: Int): Array[Byte] = {
    val v = toDoubles(a, elem)
    var m = 0.0
    var i = 0
    while (i < v.length) { val x = math.abs(v(i)); if (x > m) m = x; i += 1 }
    val scale = if (m == 0.0) 1.0 else m / 127.0
    val out = new Array[Byte](v.length)
    i = 0
    while (i < v.length) { out(i) = math.round(v(i) / scale).toByte; i += 1 }
    out
  }

  /** Cosine over two int8-quantized vectors — integer dot/norm
    * accumulation in one loop (auto-vectorizable byte math).
    */
  def int8Cosine(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"int8_cosine: vectors must have equal length (${a.length} vs ${b.length})")
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toInt; val y = b(i).toInt
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Positions where two equal-length long signatures agree — the
    * MinHash similarity estimate's numerator, one tight loop per
    * candidate pair.
    */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val xa = a.toLongArray()
    val xb = b.toLongArray()
    if (xa.length != xb.length)
      throw new IllegalArgumentException(
        s"sig_agree: signatures must have equal length (${xa.length} vs ${xb.length})" +
          " - were the two sides minhashed with different k?")
    var c = 0
    var i = 0
    while (i < xa.length) { if (xa(i) == xb(i)) c += 1; i += 1 }
    c
  }

  /** Sign-bit LSH bucket: bit i set iff vec · planes(i) ≥ 0. */
  def lshBucket(vec: ArrayData, elem: Int, planes: Array[Array[Double]]): Long = {
    val v = toDoubles(vec, elem)
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val len = math.min(v.length, p.length)
      var dot = 0.0
      var j = 0
      while (j < len) { dot += v(j) * p(j); j += 1 }
      if (dot >= 0) sig |= 1L << i
      i += 1
    }
    sig
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

/** Codegen cosine similarity of two float/double array columns — the
  * hot kernel of the ANN/near-dup path. The interpreted
  * aggregate(zip_with(...)) HOF formulation it replaces evaluated a
  * lambda per vector element; this is one generated static call per
  * row.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosineSim(l.asInstanceOf[ArrayData], VectorElem.code(left, prettyName),
      r.asInstanceOf[ArrayData], VectorElem.code(right, prettyName))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosineSim($a, ${VectorElem.code(left, prettyName)}," +
        s" $b, ${VectorElem.code(right, prettyName)})")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen signature-agreement count of two array<long> MinHash
  * signatures (replaces an interpreted aggregate(zip_with(...)) over
  * every candidate pair).
  */
case class SigAgreeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agree"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.sigAgree(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.sigAgree($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SigAgreeExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen sign-bit LSH bucket of a vector for a fixed plane set
  * (embedded in the generated code via addReferenceObj).
  */
case class LshBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshBucket(input.asInstanceOf[ArrayData],
      VectorElem.code(child, prettyName), planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.lshBucket($c, ${VectorElem.code(child, prettyName)}, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** Plan-time element-type code of a numeric array column (spliced into
  * generated kernel calls as a constant). Any numeric element type is
  * accepted — int/long/short/byte vectors widen to double exactly like
  * the HOF formulation these kernels replaced.
  */
/** Codegen int8 quantizer: array<numeric> → binary (one byte per
  * element; scale dropped because the downstream metric is cosine).
  */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantize_int8"
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.quantizeInt8(input.asInstanceOf[ArrayData], VectorElem.code(child, prettyName))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantizeInt8($c, ${VectorElem.code(child, prettyName)})")
  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Expr =
    copy(child = newChild)
}

/** Codegen cosine over two int8-quantized (binary) vectors. */
case class Int8CosineExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_cosine"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.int8Cosine(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.int8Cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Int8CosineExpr =
    copy(left = newLeft, right = newRight)
}

object VectorElem {
  def code(e: Expression, fn: String): Int = e.dataType match {
    case ArrayType(FloatType, _) => VectorKernels.ElemFloat
    case ArrayType(DoubleType, _) => VectorKernels.ElemDouble
    case ArrayType(IntegerType, _) => VectorKernels.ElemInt
    case ArrayType(LongType, _) => VectorKernels.ElemLong
    case ArrayType(ShortType, _) => VectorKernels.ElemShort
    case ArrayType(ByteType, _) => VectorKernels.ElemByte
    case other => throw new IllegalArgumentException(
      s"$fn expects an array of numeric elements, got $other")
  }
}

object VectorFunctions {
  def ivf_cell(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(IvfCellExpr(ColumnBridge.expression(vec), centroids))
  def ivf_probe_cells(vec: Column, centroids: Array[Array[Double]], p: Int): Column =
    ColumnBridge.column(IvfProbeCellsExpr(ColumnBridge.expression(vec), centroids, p))
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sig_agree(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreeExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def lsh_bucket(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(vec), planes))
  def quantize_int8(vec: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(vec)))
  def int8_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(Int8CosineExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
