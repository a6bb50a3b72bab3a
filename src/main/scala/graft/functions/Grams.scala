package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernels for consecutive-token n-gram construction — the
  * map stage under the perplexity/KN family, q_ngram_topk, and the
  * windowed-substring dedup. The `transform(sequence(...), i => ...)`
  * HOF formulation evaluates its lambda INTERPRETED per element (the
  * minhash lesson, again): per gram that is an interpreted
  * element_at/concat_ws — or, for the window keys, an interpreted
  * Md5 — multiplied by every token of a 100 TB corpus. Each kernel
  * here is one generated call per ROW that loops the token array in
  * place; output values are bit-identical to the HOF forms (same
  * tokens, same " " join, same md5 hex), so every oracle and golden
  * is unchanged.
  */
object GramKernels {

  private val space = UTF8String.fromString(" ")

  /** Space-joined n-grams of consecutive tokens; empty when sz < n. */
  def gramStrings(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i + n <= sz) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** n consecutive tokens as an n-field struct row per gram. */
  def gramStructs(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i + n <= sz) {
      val fields = new Array[Any](n)
      var j = 0
      while (j < n) { fields(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = new GenericInternalRow(fields)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All k-grams for every k = 1..n as n-field struct rows, shorter
    * grams padded with trailing nulls — ONE generator pass feeds every
    * count table of the perplexity family at once (unigram counts ride
    * the same explode + groupBy as the bigram/trigram types, so the
    * model build touches the corpus once instead of once per order).
    * Emission order is all unigrams, then all bigrams, … — order is
    * irrelevant downstream (everything aggregates), but deterministic.
    */
  def allGramStructs(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    var total = 0
    var k = 1
    while (k <= n) { if (sz >= k) total += sz - k + 1; k += 1 }
    val out = new Array[Any](total)
    var o = 0
    k = 1
    while (k <= n) {
      var i = 0
      while (i + k <= sz) {
        val fields = new Array[Any](n) // trailing entries stay null
        var j = 0
        while (j < k) { fields(j) = arr.getUTF8String(i + j); j += 1 }
        out(o) = new GenericInternalRow(fields)
        o += 1
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** (pos, md5-hex of the space-joined L-token window) per 0-based
    * window start — the stripSeenWindows key, minus the interpreted
    * per-window Md5/slice/concat. Identical bytes to SQL
    * `md5(concat_ws(' ', slice(ts, pos+1, L)))`.
    */
  def windowMd5Keys(arr: ArrayData, l: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < l) return new GenericArrayData(new Array[Any](0))
    val md = md5Local.get()
    val out = new Array[Any](sz - l + 1)
    var i = 0
    while (i + l <= sz) {
      val parts = new Array[UTF8String](l)
      var j = 0
      while (j < l) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      md.reset()
      md.update(UTF8String.concatWs(space, parts: _*).getBytes)
      val dig = md.digest()
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexChars((dig(k) >> 4) & 0xF)
        hex(2 * k + 1) = hexChars(dig(k) & 0xF)
        k += 1
      }
      out(i) = new GenericInternalRow(
        Array[Any](i, UTF8String.fromString(new String(hex))))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** ARRAY<STRING> of space-joined consecutive n-grams. */
case class GramStringsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gram_strings"
  override protected def nullSafeEval(input: Any): Any =
    GramKernels.gramStrings(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramKernels.gramStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): GramStringsExpr =
    copy(child = newChild)
}

/** ARRAY<STRUCT<f1,...,fn STRING>> of consecutive n-grams. */
case class GramStructsExpr(child: Expression, fields: Seq[String])
    extends UnaryExpression {
  require(fields.nonEmpty, "need at least one field name")
  override def dataType: DataType = ArrayType(
    StructType(fields.map(f => StructField(f, StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "gram_structs"
  override protected def nullSafeEval(input: Any): Any =
    GramKernels.gramStructs(input.asInstanceOf[ArrayData], fields.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramKernels.gramStructs($c, ${fields.size})")
  override protected def withNewChildInternal(newChild: Expression): GramStructsExpr =
    copy(child = newChild)
}

/** ARRAY<STRUCT<f1,...,fn STRING>> of ALL k-grams, k = 1..n, shorter
  * grams null-padded on the right ([[GramKernels.allGramStructs]]).
  */
case class AllGramStructsExpr(child: Expression, fields: Seq[String])
    extends UnaryExpression {
  require(fields.nonEmpty, "need at least one field name")
  override def dataType: DataType = ArrayType(
    StructType(fields.map(f => StructField(f, StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "all_gram_structs"
  override protected def nullSafeEval(input: Any): Any =
    GramKernels.allGramStructs(input.asInstanceOf[ArrayData], fields.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramKernels.allGramStructs($c, ${fields.size})")
  override protected def withNewChildInternal(newChild: Expression): AllGramStructsExpr =
    copy(child = newChild)
}

/** ARRAY<STRUCT<pos INT, key STRING>> of L-token window md5 keys. */
case class WindowMd5KeysExpr(child: Expression, l: Int) extends UnaryExpression {
  require(l >= 1, s"window length must be >= 1, got $l")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("key", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "window_md5_keys"
  override protected def nullSafeEval(input: Any): Any =
    GramKernels.windowMd5Keys(input.asInstanceOf[ArrayData], l)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramKernels.windowMd5Keys($c, $l)")
  override protected def withNewChildInternal(newChild: Expression): WindowMd5KeysExpr =
    copy(child = newChild)
}

/** Column-API lifts. */
object Grams {
  def gram_strings(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramStringsExpr(ColumnBridge.expression(tokens), n))
  def gram_structs(tokens: Column, fields: Seq[String]): Column =
    ColumnBridge.column(GramStructsExpr(ColumnBridge.expression(tokens), fields))
  def all_gram_structs(tokens: Column, fields: Seq[String]): Column =
    ColumnBridge.column(AllGramStructsExpr(ColumnBridge.expression(tokens), fields))
  def window_md5_keys(tokens: Column, l: Int): Column =
    ColumnBridge.column(WindowMd5KeysExpr(ColumnBridge.expression(tokens), l))
}
