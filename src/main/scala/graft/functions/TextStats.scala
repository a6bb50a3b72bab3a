package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-statistics kernel behind the TextOps quality family
  * (tokenCount / punctRatio / alphaRatio / meanWordLen / stopwordRatio
  * / qualityScore and the Gopher rule pack).
  *
  * Before r21 each of those was its own regex / split / interpreted-HOF
  * Column stack — a single qualityScore evaluated split(lower(text))
  * four times plus two corpus-wide regexp_replace passes, and HOF
  * lambdas (ArrayFilter) are CodegenFallback, so none of it ran inside
  * whole-stage codegen (q_quality_auc spent ~1.9 s of its 2.1 s in this
  * scoring projection at sf0.1). The kernel folds everything into two
  * byte-level passes (original text; lowercased text) and returns a
  * fixed array of counts; the ratio arithmetic stays in Column algebra
  * so every published value is bit-identical to the HOF formulation
  * (pinned in TextOpsSpec, and the DuckDB oracles replay unchanged).
  *
  * Exact semantics replicated (Java regex, Spark functions):
  *  - characters = code points (UTF8String.numChars semantics);
  *  - alpha = [A-Za-z]; punct = POSIX \p{Punct} (ASCII 33-126 minus
  *    alphanumerics) — both byte-testable in UTF-8;
  *  - tokens = split(lower(text), "\\s+") minus empties, where \s is
  *    Java's ASCII class [ \t\n\x0B\f\r] and lower is
  *    UTF8String.toLowerCase (the Lower expression's own kernel);
  *  - stopword hits compare token BYTES against the language lists —
  *    exact equality, no hashing (the oracle-facing functions must not
  *    inherit langId's collision tolerance);
  *  - lines = split(text, "\n") segments with ≥1 non-space char (Spark
  *    trim strips 0x20 only); bullet = first char after leading spaces
  *    ∈ {-, *, •}; ellipsis = after trailing spaces, ends in "..." or
  *    "…" (both 3 UTF-8 bytes);
  *  - symbols = left-to-right non-overlapping matches of #|\.\.\.
  *    (regexp_extract_all scan order: "...." counts one match).
  */
object TextStats {

  /** Canonical per-language stopword lists (top function words) —
    * TextOps.stopwords re-exports this map; TextHashing.langTables
    * derives its hashed tables from the same words.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "im"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "les", "dans", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))

  /** Languages in sorted order — the index of `langs` is the offset of
    * that language's hit count at IDX_SW_BASE + i.
    */
  val langs: Array[String] = stopwords.keys.toArray.sorted

  // output array layout
  val IDX_CHARS = 0        // code points of the original text
  val IDX_ALPHA = 1        // [A-Za-z] chars
  val IDX_PUNCT = 2        // \p{Punct} chars
  val IDX_TOKENS = 3       // whitespace tokens (of lower(text))
  val IDX_TOK_CHARS = 4    // Σ token code points (of lower(text))
  val IDX_SW_BASE = 5      // per-lang stopword hit counts (langs order)
  val IDX_ALPHA_WORDS: Int = IDX_SW_BASE + langs.length // tokens with ≥1 [a-z]
  val IDX_SYMBOLS: Int = IDX_ALPHA_WORDS + 1  // '#' or '...' occurrences
  val IDX_LINES: Int = IDX_SYMBOLS + 1        // non-blank lines
  val IDX_BULLET: Int = IDX_LINES + 1         // bullet lines
  val IDX_ELLIPSIS: Int = IDX_BULLET + 1      // ellipsis-terminated lines
  val IDX_SW_DISTINCT_EN: Int = IDX_ELLIPSIS + 1 // distinct en stopwords
  val N_FIELDS: Int = IDX_SW_DISTINCT_EN + 1

  private val swBytes: Array[Array[Array[Byte]]] =
    langs.map(l => stopwords(l).map(_.getBytes(StandardCharsets.UTF_8)).toArray)
  private val enIdx: Int = langs.indexOf("en")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** All statistics of one document. Two passes over the bytes (the
    * second over the lowercased copy), zero regex, zero per-token
    * allocation.
    */
  def stats(s: UTF8String): Array[Long] = {
    val out = new Array[Long](N_FIELDS)
    val n = s.numBytes()

    // ---- pass 1: original text ----
    var i = 0
    var lineStart = 0        // current \n-separated segment start
    var lineNonBlank = false // any byte != 0x20 seen in the segment
    while (i <= n) {
      val b: Byte = if (i == n) '\n' else s.getByte(i)
      if (i < n) {
        if ((b & 0xC0) != 0x80) out(IDX_CHARS) += 1
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) out(IDX_ALPHA) += 1
        else if (b > ' ' && b < 127 && !(b >= '0' && b <= '9')) out(IDX_PUNCT) += 1
        if (b == '#') out(IDX_SYMBOLS) += 1
        else if (b == '.' && i + 2 < n && s.getByte(i + 1) == '.' &&
            s.getByte(i + 2) == '.') {
          out(IDX_SYMBOLS) += 1
          // regexp_extract_all consumes the match ("...." is ONE hit);
          // the two consumed dots are still chars + punct
          out(IDX_CHARS) += 2
          out(IDX_PUNCT) += 2
          i += 2
        }
      }
      if (b == '\n') {
        // segment [lineStart, i) ends (the virtual trailing '\n' closes
        // the final segment — split keeps it; blank ones are filtered)
        if (lineNonBlank) {
          out(IDX_LINES) += 1
          // bullet: first char after leading 0x20 spaces ∈ {-, *, •}
          var p = lineStart
          while (p < i && s.getByte(p) == ' ') p += 1
          if (p < i) {
            val c = s.getByte(p)
            if (c == '-' || c == '*' ||
                (c == 0xE2.toByte && p + 2 < i && s.getByte(p + 1) == 0x80.toByte &&
                  s.getByte(p + 2) == 0xA2.toByte))
              out(IDX_BULLET) += 1
          }
          // ellipsis: after trailing 0x20 spaces, ends with "..." or "…".
          // INTENTIONAL divergence from the historical Spark
          // rlike("(\.\.\.|…)$") form (ADVICE r21): Java's $ also
          // matches just before a FINAL line terminator, so a CRLF
          // line "x...\r" counted as ellipsis there; this kernel (and
          // the RE2-based DuckDB oracle, which the old Spark form
          // disagreed with) requires the ellipsis to be the true end
          // of the line after 0x20-trimming. TextOpsSpec pins the
          // kernel semantics against a rlike("(...|…)\z") reference
          // including a CRLF+ellipsis edge row.
          var q = i
          while (q > lineStart && s.getByte(q - 1) == ' ') q -= 1
          if (q - lineStart >= 3) {
            val b1 = s.getByte(q - 3); val b2 = s.getByte(q - 2); val b3 = s.getByte(q - 1)
            if ((b1 == '.' && b2 == '.' && b3 == '.') ||
                (b1 == 0xE2.toByte && b2 == 0x80.toByte && b3 == 0xA6.toByte))
              out(IDX_ELLIPSIS) += 1
          }
        }
        lineStart = i + 1
        lineNonBlank = false
      } else if (i < n && b != ' ') lineNonBlank = true
      i += 1
    }

    // ---- pass 2: lowercased text (token semantics of split(lower(…))) ----
    val lower = s.toLowerCase
    val ln = lower.numBytes()
    var enMask = 0 // distinct-en-stopword bitmask (10 words)
    var j = 0
    var tokStart = -1
    while (j <= ln) {
      val ws = j == ln || isWs(lower.getByte(j))
      if (ws) {
        if (tokStart >= 0) {
          out(IDX_TOKENS) += 1
          var k = tokStart
          var hasAlpha = false
          while (k < j) {
            val tb = lower.getByte(k)
            if ((tb & 0xC0) != 0x80) out(IDX_TOK_CHARS) += 1
            if (tb >= 'a' && tb <= 'z') hasAlpha = true
            k += 1
          }
          if (hasAlpha) out(IDX_ALPHA_WORDS) += 1
          enMask |= matchStopwords(lower, tokStart, j, out)
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = j
      j += 1
    }
    out(IDX_SW_DISTINCT_EN) = java.lang.Integer.bitCount(enMask)
    out
  }

  /** Increment per-lang hit counts for the token at [from, to); returns
    * the bitmask of matched EN stopword indices (for the distinct count).
    */
  private def matchStopwords(s: UTF8String, from: Int, to: Int,
                             out: Array[Long]): Int = {
    val len = to - from
    var enMask = 0
    var li = 0
    while (li < swBytes.length) {
      val words = swBytes(li)
      var wi = 0
      var hit = false
      while (wi < words.length) {
        val w = words(wi)
        if (w.length == len) {
          var k = 0
          while (k < len && s.getByte(from + k) == w(k)) k += 1
          if (k == len) {
            hit = true
            if (li == enIdx) enMask |= 1 << wi
          }
        }
        wi += 1
      }
      if (hit) out(IDX_SW_BASE + li) += 1
      li += 1
    }
    enMask
  }
}

/** DSIR importance-weight scorer kernel: Σ over whitespace tokens of
  * weights[bucket(token)], with bucket = the md5-prefix integer
  * pmod(hexSliceToLong(md5(token), 1), weights.length) — byte-for-byte
  * the construction TextOps.dsirScores' Column form used (md5 over the
  * lowered token's UTF-8 bytes; first 4 digest bytes as a big-endian
  * uint32). One pass, one digest per token, summed in token order so
  * the result is bit-identical to the interpreted
  * aggregate(transform(...)) fold it replaces (r21; pinned in
  * TextOpsSpec and by the unchanged DuckDB oracle).
  */
object DsirKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def dsirSum(s: UTF8String, weights: Array[Double]): Double = {
    val lower = s.toLowerCase
    val ln = lower.numBytes()
    val md = md5Local.get()
    var sum = 0.0
    var j = 0
    var tokStart = -1
    while (j <= ln) {
      val ws = j == ln || {
        val b = lower.getByte(j)
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      }
      if (ws) {
        if (tokStart >= 0) {
          val tok = new Array[Byte](j - tokStart)
          var k = 0
          while (k < tok.length) { tok(k) = lower.getByte(tokStart + k); k += 1 }
          md.reset()
          val d = md.digest(tok)
          // first 8 hex chars of md5 = first 4 digest bytes, big-endian
          var v = 0L
          var i = 0
          while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
          sum += weights((v % weights.length).toInt)
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = j
      j += 1
    }
    sum
  }
}

case class DsirSumExpr(child: Expression, weights: Array[Double])
    extends UnaryExpression {
  require(weights.nonEmpty, "dsir weights must be non-empty")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_sum"
  override protected def nullSafeEval(input: Any): Any =
    DsirKernel.dsirSum(input.asInstanceOf[UTF8String], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirKernel.dsirSum($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): DsirSumExpr =
    copy(child = newChild)
}

/** Codegen expression: one kernel call per row (same shape as the
  * TextHashExpressions family — stays inside whole-stage codegen).
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextStats.stats(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextStats.stats($c))")
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsFunctions {
  def text_stats(text: Column): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(text)))
  def dsir_sum(text: Column, weights: Array[Double]): Column =
    ColumnBridge.column(DsirSumExpr(ColumnBridge.expression(text), weights))
}
