package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels for the ANN scale path (Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search"): a
  * normalized vector is split into `m` subspaces and each sub-vector
  * replaced by the index of its nearest sub-codebook entry — one BYTE
  * per subspace, a 4·dim/m × compression of the corpus payload
  * (dim=64, m=8: 256 B float32 → 8 B codes, 32×). Cosine against a
  * query is reconstructed from codebook dot products, normalized by
  * the reconstruction's own norm.
  *
  * Codebooks are `[m][ksub][dim/m]` doubles — training state is
  * m·ksub·(dim/m) = ksub·dim values regardless of corpus size, and
  * the table rides the generated code via addReferenceObj exactly
  * like the IVF centroid table.
  */
object PqKernels {

  /** L2-normalized copy of the vector (PQ encodes unit vectors so
    * inner product == cosine). Zero vectors stay zero.
    */
  def normalize(vec: ArrayData, elem: Int): Array[Double] = {
    val v = VectorKernels.toDoubles(vec, elem)
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n == 0) return v
    val inv = 1.0 / math.sqrt(n)
    i = 0
    while (i < v.length) { v(i) *= inv; i += 1 }
    v
  }

  /** argmin_c ||sub − cb[j][c]||² for one subspace slice of a
    * normalized vector. Used during Lloyd training, where the corpus
    * explodes to (j, sub-vector) rows.
    */
  def argminSub(sub: ArrayData, elem: Int, j: Int,
                codebooks: Array[Array[Array[Double]]]): Int = {
    val v = VectorKernels.toDoubles(sub, elem)
    argminSubVec(v, 0, v.length, codebooks(j))
  }

  private def argminSubVec(v: Array[Double], off: Int, len: Int,
                           cb: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val e = cb(c)
      var d = 0.0; var i = 0
      while (i < len && i < e.length) {
        val x = v(off + i) - e(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode: normalize, then per subspace the nearest codebook index.
    * Returns m bytes (ksub ≤ 256, enforced at training time).
    */
  def pqEncode(vec: ArrayData, elem: Int,
               codebooks: Array[Array[Array[Double]]]): Array[Byte] = {
    val v = normalize(vec, elem)
    val m = codebooks.length
    if (v.length % m != 0)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${v.length} is not divisible by m=$m " +
          "(tail dimensions would be silently dropped)")
    val sub = v.length / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      out(j) = argminSubVec(v, j * sub, sub, codebooks(j)).toByte
      j += 1
    }
    out
  }

  /** The m normalized sub-vectors of a vector — the training-time
    * explode source (corpus → m sub-rows per vector, one scan per
    * Lloyd iteration regardless of m).
    */
  def subVectors(vec: ArrayData, elem: Int, m: Int): ArrayData = {
    val v = normalize(vec, elem)
    val sub = v.length / m
    new GenericArrayData(Array.tabulate(m)(j =>
      new GenericArrayData(java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))))
  }

  /** Asymmetric-distance cosine: the query stays exact (normalized),
    * the corpus side is reconstructed from its codes —
    *   cos ≈ Σ_j q̂_j · cb[j][code_j]  /  ‖recon‖
    * (q̂ is unit by construction; the reconstruction's norm ≈ 1 but is
    * divided out exactly for accuracy).
    */
  def pqCosine(q: ArrayData, qElem: Int, codes: Array[Byte],
               codebooks: Array[Array[Array[Double]]]): Double = {
    val qv = normalize(q, qElem)
    val m = codebooks.length
    val sub = qv.length / m
    var dot = 0.0
    var rn = 0.0
    var j = 0
    while (j < m) {
      val e = codebooks(j)(codes(j) & 0xFF)
      var i = 0
      while (i < sub && i < e.length) {
        dot += qv(j * sub + i) * e(i)
        rn += e(i) * e(i)
        i += 1
      }
      j += 1
    }
    if (rn == 0) 0.0 else dot / math.sqrt(rn)
  }

  /** Per-query ADC lookup table (Jégou's asymmetric-distance trick):
    * LUT[j·ksub + c] = q̂_j · cb[j][c], computed ONCE per query row —
    * m·ksub doubles (16×64 = 8 KB). Scoring a corpus row then costs
    * O(m) table lookups instead of O(dim) multiplies.
    */
  def pqLut(q: ArrayData, qElem: Int,
            codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val qv = normalize(q, qElem)
    val m = codebooks.length
    val sub = qv.length / m
    val ksub = codebooks(0).length
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val e = codebooks(j)(c)
        var dot = 0.0; var i = 0
        while (i < sub && i < e.length) { dot += qv(j * sub + i) * e(i); i += 1 }
        lut(j * ksub + c) = dot
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  /** Precomputed per-entry squared norms for the LUT score's
    * denominator — derived from the codebooks on the driver, m·ksub
    * doubles.
    */
  def norm2Table(codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] =
    codebooks.map(_.map(e => e.map(x => x * x).sum))

  /** O(m) ADC score: Σ_j LUT[j·ksub + code_j] / ‖reconstruction‖. */
  def pqLutScore(lut: ArrayData, codes: Array[Byte],
                 norm2: Array[Array[Double]]): Double = {
    val m = codes.length
    val ksub = norm2(0).length
    val l = lut.toDoubleArray()
    var dot = 0.0
    var rn = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      dot += l(j * ksub + c)
      rn += norm2(j)(c)
      j += 1
    }
    if (rn == 0) 0.0 else dot / math.sqrt(rn)
  }
}

case class PqSubVectorsExpr(child: Expression, m: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_subvectors"
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.subVectors(input.asInstanceOf[ArrayData],
      VectorElem.code(child, prettyName), m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.subVectors($c, ${VectorElem.code(child, prettyName)}, $m)")
  override protected def withNewChildInternal(newChild: Expression): PqSubVectorsExpr =
    copy(child = newChild)
}

/** Training-time assignment: (subspaceIndex, subVector) → nearest
  * sub-codebook index. The subspace index is a COLUMN (the corpus
  * explodes once per Lloyd iteration into m sub-rows), so one pass
  * assigns every subspace.
  */
case class PqArgminExpr(left: Expression, right: Expression,
                        codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_argmin"
  override protected def nullSafeEval(j: Any, sub: Any): Any =
    PqKernels.argminSub(sub.asInstanceOf[ArrayData],
      VectorElem.code(right, prettyName), j.asInstanceOf[Int], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (j, s) =>
      s"graft.functions.PqKernels.argminSub($s, ${VectorElem.code(right, prettyName)}, $j, $ref)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqArgminExpr =
    copy(left = newLeft, right = newRight)
}

case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.pqEncode(input.asInstanceOf[ArrayData],
      VectorElem.code(child, prettyName), codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.pqEncode($c, ${VectorElem.code(child, prettyName)}, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

case class PqCosineExpr(left: Expression, right: Expression,
                        codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_cosine"
  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqKernels.pqCosine(q.asInstanceOf[ArrayData],
      VectorElem.code(left, prettyName), codes.asInstanceOf[Array[Byte]], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqKernels.pqCosine($q, ${VectorElem.code(left, prettyName)}, $c, $ref)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqCosineExpr =
    copy(left = newLeft, right = newRight)
}

case class PqLutExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.pqLut(input.asInstanceOf[ArrayData],
      VectorElem.code(child, prettyName), codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.pqLut($c, ${VectorElem.code(child, prettyName)}, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

case class PqLutScoreExpr(left: Expression, right: Expression,
                          norm2: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_lut_score"
  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqKernels.pqLutScore(lut.asInstanceOf[ArrayData],
      codes.asInstanceOf[Array[Byte]], norm2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNorm2", norm2, "double[][]")
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqKernels.pqLutScore($l, $c, $ref)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqLutScoreExpr =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pq_subvectors(vec: Column, m: Int): Column =
    ColumnBridge.column(PqSubVectorsExpr(ColumnBridge.expression(vec), m))
  def pq_argmin(j: Column, sub: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqArgminExpr(ColumnBridge.expression(j),
      ColumnBridge.expression(sub), codebooks))
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), codebooks))
  def pq_cosine(q: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqCosineExpr(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), codebooks))
  def pq_lut(q: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(q), codebooks))
  def pq_lut_score(lut: Column, codes: Column, norm2: Array[Array[Double]]): Column =
    ColumnBridge.column(PqLutScoreExpr(ColumnBridge.expression(lut),
      ColumnBridge.expression(codes), norm2))
}
