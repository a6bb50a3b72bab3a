package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text normalization for corpus ingestion — the C4/CCNet-style
  * cleanup pass, as one codegen kernel per row:
  *
  *  1. Unicode NFKC (JDK `java.text.Normalizer`): ligatures split
  *     (ﬁ→fi), full-width forms fold to ASCII (Ａ→A), compatibility
  *     glyphs decompose (½→1⁄2).
  *  2. Typographic quotes/dashes fold to ASCII (" " ' ' — – → " ' -).
  *  3. Control characters (except \n and \t) drop; \r\n and \r → \n.
  *  4. Horizontal whitespace runs collapse to one space; newline
  *     runs collapse to at most two (the paragraph break survives —
  *     paragraphDedup splits on it); outer whitespace trims.
  *
  * Deterministic, locale-independent, and idempotent — normalizing a
  * normalized string is a no-op (NormalizeSpec pins it).
  */
object NormalizeKernels {

  def normalize(text: String): String = {
    val nfkc = java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(nfkc.length)
    var i = 0
    val n = nfkc.length
    var pendingSpace = false
    var pendingNewlines = 0
    var started = false
    while (i < n) {
      var c = nfkc.charAt(i)
      // typographic folds
      c = c match {
        case '‘' | '’' | '‚' | '′' => '\''
        case '“' | '”' | '„' | '″' => '"'
        case '–' | '—' | '―' | '−' => '-'
        case ' ' | ' ' | ' ' => ' '
        case other => other
      }
      if (c == '\r') {
        // \r\n and bare \r → newline
        if (i + 1 < n && nfkc.charAt(i + 1) == '\n') i += 1
        pendingNewlines += 1
        pendingSpace = false
      } else if (c == '\n') {
        pendingNewlines += 1
        pendingSpace = false
      } else if (c == ' ' || c == '\t' || Character.isWhitespace(c)) {
        pendingSpace = true
      } else if (Character.isISOControl(c)) {
        () // dropped
      } else {
        if (started) {
          if (pendingNewlines >= 2) sb.append("\n\n")
          else if (pendingNewlines == 1) sb.append('\n')
          else if (pendingSpace) sb.append(' ')
        }
        pendingNewlines = 0
        pendingSpace = false
        started = true
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeKernels.normalize(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeKernels.normalize($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeFunctions {
  def normalize_text(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))
}
