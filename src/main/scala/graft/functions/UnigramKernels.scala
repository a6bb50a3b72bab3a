package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation kernel for [[graft.operators.UnigramLm]]
  * (SentencePiece's unigram model — Kudo 2018, "Subword
  * Regularization"): segment a word into the max-probability piece
  * sequence under the current piece log-probabilities. The vocabulary
  * rides into the generated code as a referenced object, so the
  * per-iteration E-step and the final corpus encode are one codegen
  * loop per row — the same broadcast-model-in/partials-out shape as
  * the classifier.
  *
  * Tie-break: on equal score the LONGER candidate piece wins, then
  * lexicographic — deterministic at any partition layout. Characters
  * absent from the vocabulary segment as single-char pieces with a
  * fixed unknown penalty, so every string has a segmentation.
  */
object UnigramKernels {

  final val UnkLogp: Double = -20.0

  /** Best-path segmentation of `word`; returns the piece sequence. */
  def segment(word: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val bkLen = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      i += 1
    }
    i = 0
    while (i < n) {
      if (!best(i).isNegInfinity || i == 0) {
        val from = best(i)
        var l = 1
        val maxl = math.min(maxLen, n - i)
        while (l <= maxl) {
          val piece = word.substring(i, i + l)
          val lp = vocab.get(piece)
          val score =
            if (lp != null) from + lp.doubleValue()
            else if (l == 1) from + UnkLogp
            else Double.NaN
          if (!score.isNaN) {
            val j = i + l
            // longer-piece-wins tie-break keeps the path deterministic
            if (score > best(j) || (score == best(j) && l > bkLen(j))) {
              best(j) = score
              bkLen(j) = l
            }
          }
          l += 1
        }
      }
      i += 1
    }
    // backtrack
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val l = bkLen(p)
      out = word.substring(p - l, p) :: out
      p -= l
    }
    out.toArray
  }

  /** Segmentation score (sum of piece log-probs) of the best path. */
  def score(word: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Double = {
    var s = 0.0
    segment(word, vocab, maxLen).foreach { piece =>
      val lp = vocab.get(piece)
      s += (if (lp != null) lp.doubleValue() else UnkLogp)
    }
    s
  }

  /** All substrings of `word` with length ≤ maxLen, document order. */
  def substringsUpTo(word: String, maxLen: Int): GenericArrayData = {
    val n = word.length
    val out = new java.util.ArrayList[Any](n * maxLen)
    var i = 0
    while (i < n) {
      var l = 1
      val maxl = math.min(maxLen, n - i)
      while (l <= maxl) {
        out.add(UTF8String.fromString(word.substring(i, i + l)))
        l += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** −Σ log p over the Viterbi pieces of every token of `text`. */
  def textBits(text: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Double = {
    var s = 0.0
    TextHashing.tokensOf(text).foreach(w => s -= score(w, vocab, maxLen))
    s
  }

  /** Segment every whitespace token of `text` and concatenate the
    * piece sequences (document-level encode).
    */
  def encodeText(text: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData = {
    val toks = TextHashing.tokensOf(text)
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length * 2)
    toks.foreach { w =>
      segment(w, vocab, maxLen).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<string> of unigram-LM pieces for all tokens of a document. */
case class UnigramEncodeExpr(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernels.encodeText(input.asInstanceOf[UTF8String].toString, vocab, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernels.encodeText($c.toString(), $v, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

/** All substrings of a word up to maxLen — the unigram seed
  * candidates, generated corpus-side so the seed aggregation is
  * distributed (the word table never collects whole).
  */
case class SubstringsExpr(child: Expression, maxLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "substrings_upto"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernels.substringsUpTo(input.asInstanceOf[UTF8String].toString, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernels.substringsUpTo($c.toString(), $maxLen)")
  override protected def withNewChildInternal(newChild: Expression): SubstringsExpr =
    copy(child = newChild)
}

/** −Σ log p(piece) over the Viterbi encode of every token of `text`
  * (negative description length; UnkLogp for out-of-vocab chars).
  */
case class UnigramScoreExpr(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "unigram_bits"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernels.textBits(input.asInstanceOf[UTF8String].toString, vocab, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernels.textBits($c.toString(), $v, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramScoreExpr =
    copy(child = newChild)
}

object UnigramFunctions {
  def unigram_encode(text: Column,
      vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int): Column =
    ColumnBridge.column(UnigramEncodeExpr(ColumnBridge.expression(text), vocab, maxLen))
  def substrings_upto(word: Column, maxLen: Int): Column =
    ColumnBridge.column(SubstringsExpr(ColumnBridge.expression(word), maxLen))
}
