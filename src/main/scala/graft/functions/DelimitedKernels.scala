package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-scan literal splitting for the delimited payload codec
  * (reference: internal/converter/delimited — its Go decoder is a
  * strings.Split, not a regex). Spark's `split` compiles the pattern
  * through the regex engine even for a `Pattern.quote`d literal; this
  * kernel is a single pass over the UTF-8 bytes with no compilation,
  * no backtracking machinery, and slices that share the row's byte
  * array. Byte-exact matching is UTF-8-correct for any delimiter: a
  * valid byte sequence can't begin inside a multi-byte code point.
  *
  * Semantics match `split(str, Pattern.quote(d), -1)` for any
  * NON-EMPTY delimiter: all fields kept, including trailing empties;
  * null in → null out. An empty delimiter returns the whole string as
  * ONE field — this intentionally diverges from the zero-width-regex
  * char-split; callers wanting that behavior (Codecs.decodeDelimited
  * does) must route the empty-delimiter case to `split` themselves.
  */
object DelimitedKernels {

  def splitLiteral(s: UTF8String, delim: Array[Byte]): Array[UTF8String] = {
    val b = s.getBytes
    val dl = delim.length
    if (dl == 0 || b.length < dl) return Array(s)
    // count separators first: exact-size allocation, no growable buffer
    var count = 0
    var i = 0
    val limit = b.length - dl
    while (i <= limit) {
      var j = 0
      while (j < dl && b(i + j) == delim(j)) j += 1
      if (j == dl) { count += 1; i += dl } else i += 1
    }
    if (count == 0) return Array(s)
    val out = new Array[UTF8String](count + 1)
    var field = 0
    var start = 0
    i = 0
    while (i <= limit) {
      var j = 0
      while (j < dl && b(i + j) == delim(j)) j += 1
      if (j == dl) {
        out(field) = UTF8String.fromBytes(b, start, i - start)
        field += 1
        start = i + dl
        i += dl
      } else i += 1
    }
    out(field) = UTF8String.fromBytes(b, start, b.length - start)
    out
  }

  /** Column API: literal split of `frame` on `delimiter`. */
  def literal_split(frame: Column, delimiter: String): Column =
    ColumnBridge.column(
      LiteralSplitExpr(ColumnBridge.expression(frame), delimiter))
}

case class LiteralSplitExpr(child: Expression, delimiter: String)
    extends UnaryExpression {
  private lazy val delimBytes: Array[Byte] =
    delimiter.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "literal_split"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(DelimitedKernels.splitLiteral(
      input.asInstanceOf[UTF8String], delimBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val delimRef = ctx.addReferenceObj("delim", delimBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.DelimitedKernels.splitLiteral($c, $delimRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): LiteralSplitExpr =
    copy(child = newChild)
}
