package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE encoding kernel — the codegen replacement for
  * [[graft.operators.Bpe.encode]]'s regexp_replace chain, which costs
  * one full regex scan per merge per token. The kernel tokenizes,
  * splits to symbols, and replays every merge in one generated-loop
  * call per row; BpeSpec pins it byte-identical to the regex chain on
  * real documents and on pathological inputs.
  *
  * Tokenization mirrors the Column form exactly: ASCII \s+ splitting
  * (Java regex \s, NOT Character.isWhitespace — that would also split
  * U+2028 etc. and diverge from split(lower(text), "\\s+")), then
  * per-code-point symbol split, then rank-ordered left-to-right
  * non-overlapping merges.
  */
object BpeRuntime {

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** merges are flattened [l0, r0, l1, r1, ...] (rank order). */
  def encode(text: String, flat: Array[String]): GenericArrayData = {
    val out = new java.util.ArrayList[AnyRef](math.max(8, text.length / 4))
    val len = text.length
    var i = 0
    while (i < len) {
      while (i < len && isAsciiSpace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isAsciiSpace(text.charAt(i))) i += 1
      if (i > start) encodeWord(text, start, i, flat, out)
    }
    val res = new Array[AnyRef](out.size)
    out.toArray(res)
    new GenericArrayData(res)
  }

  private def encodeWord(text: String, start: Int, end: Int,
                         flat: Array[String],
                         out: java.util.ArrayList[AnyRef]): Unit = {
    // split the lower-cased word into per-code-point symbols
    var syms = new java.util.ArrayList[String](end - start)
    var i = start
    while (i < end) {
      val cp = Character.toLowerCase(text.codePointAt(i))
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    // replay merges in rank order, each a left-to-right
    // non-overlapping scan
    var m = 0
    while (m < flat.length - 1) {
      val l = flat(m); val r = flat(m + 1)
      var j = 0
      var merged: java.util.ArrayList[String] = null
      while (j < syms.size) {
        if (j < syms.size - 1 && syms.get(j) == l && syms.get(j + 1) == r) {
          if (merged == null) {
            merged = new java.util.ArrayList[String](syms.size)
            var k = 0
            while (k < j) { merged.add(syms.get(k)); k += 1 }
          }
          merged.add(l + r); j += 2
        } else {
          if (merged != null) merged.add(syms.get(j))
          j += 1
        }
      }
      if (merged != null) syms = merged
      m += 2
    }
    var j = 0
    while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
  }
}

case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  private lazy val flat: Array[String] =
    merges.flatMap { case (l, r) => Seq(l, r) }.toArray
  override protected def nullSafeEval(input: Any): Any =
    BpeRuntime.encode(input.asInstanceOf[UTF8String].toString, flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeRuntime.encode($c.toString(), $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeFunctions {
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), merges))
}
