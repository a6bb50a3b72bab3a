package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serving-side Kneser-Ney scorer: a bigram KN model collapsed to
  * hash tables (vocabulary-bounded — n-gram TYPES, not corpus size)
  * rides into generated code as a referenced object, so scoring an
  * ARRIVING document is one map-only kernel call — the bm25Scorer
  * pattern applied to the LM-quality filter. Unlike the self-trained
  * batch operator, serving text routinely contains unseen histories
  * and out-of-vocabulary words, so every backoff branch of
  * [[graft.operators.TextOps.lmPerplexityKN]]'s formula is live here:
  * unseen history → continuation probability; unseen continuation →
  * the add-half floor.
  */
final class KnModel(
    val c1: java.util.HashMap[String, java.lang.Long],
    val c2: java.util.HashMap[String, java.lang.Long],   // "w1 w2" → count
    val n1p: java.util.HashMap[String, java.lang.Long],  // N1+(w1·)
    val n1m: java.util.HashMap[String, java.lang.Long],  // N1+(·w2)
    val nTypes: Long,
    val vocab: Long,
    val discount: Double) extends Serializable {

  @inline private def pcont(w2: String): Double = {
    val h = n1m.get(w2)
    ((if (h == null) 0L else h.longValue()) + 0.5) / (nTypes + 0.5 * vocab)
  }

  /** P(w2|w1) with full backoff; always in (0, 1). A history that is
    * in the unigram table but never starts a bigram (a word seen only
    * document-finally in training) has no continuation mass at all —
    * back off to the continuation probability, exactly as an unseen
    * history does (Kn3Model guards the same case via den == 0).
    */
  def prob(w1: String, w2: String): Double = {
    val h = c1.get(w1)
    val base = pcont(w2)
    val conts = if (h == null) null else n1p.get(w1)
    val p =
      if (h == null || conts == null) base
      else {
        val cHist = h.longValue().toDouble
        val cBi = c2.get(w1 + " " + w2)
        val seen = if (cBi == null) 0.0 else math.max(cBi.longValue() - discount, 0.0)
        val lambda = discount * conts.longValue() / cHist
        seen / cHist + lambda * base
      }
    math.min(p, 0.999999)
  }

  /** avg(−log P) over the document's bigrams; 0.0 for < 2 tokens. */
  def bits(text: String): Double = {
    val ts = TextHashing.tokensOf(text)
    if (ts.length < 2) return 0.0
    var s = 0.0
    var i = 1
    while (i < ts.length) {
      s -= math.log(prob(ts(i - 1), ts(i)))
      i += 1
    }
    s / (ts.length - 1)
  }
}

/** Order-3 serving model: the full KenLM recursion over hash tables.
  * Every table is n-gram-TYPE bounded, but trigram types grow with
  * corpus breadth — this serving form is for BOUNDED reference
  * corpora (every deployed LM trains on a sample; the batch operator
  * [[graft.operators.TextOps.lmPerplexityKN3]] is the corpus-scale
  * path). Keys are space-joined tokens (tokens cannot contain
  * whitespace).
  */
final class Kn3Model(
    val c3: java.util.HashMap[String, java.lang.Long],       // "w1 w2 w3"
    val c2h: java.util.HashMap[String, java.lang.Long],      // "w1 w2" (trigram occurrences)
    val n1pTop: java.util.HashMap[String, java.lang.Long],   // N1+(w1w2·)
    val n1pMid: java.util.HashMap[String, java.lang.Long],   // N1+(·w2w3), key "w2 w3"
    val n1pMidAll: java.util.HashMap[String, java.lang.Long],// N1+(·w2·)
    val n1pW2: java.util.HashMap[String, java.lang.Long],    // N1+(w2·)
    val n1m: java.util.HashMap[String, java.lang.Long],      // N1+(·w3)
    val nTypes: Long,
    val vocab: Long,
    val discount: Double) extends Serializable {

  @inline private def get(m: java.util.HashMap[String, java.lang.Long], k: String): Long = {
    val v = m.get(k); if (v == null) 0L else v.longValue()
  }

  @inline private def pcont(w3: String): Double =
    (get(n1m, w3) + 0.5) / (nTypes + 0.5 * vocab)

  def prob2(w2: String, w3: String): Double = {
    val den = get(n1pMidAll, w2)
    val base = pcont(w3)
    if (den == 0L) base
    else {
      val seen = math.max(get(n1pMid, w2 + " " + w3) - discount, 0.0) / den
      seen + (discount * get(n1pW2, w2) / den) * base
    }
  }

  def prob3(w1: String, w2: String, w3: String): Double = {
    val hist = get(c2h, w1 + " " + w2)
    val p =
      if (hist == 0L) prob2(w2, w3)
      else {
        val seen = math.max(get(c3, w1 + " " + w2 + " " + w3) - discount, 0.0) / hist
        seen + (discount * get(n1pTop, w1 + " " + w2) / hist) * prob2(w2, w3)
      }
    math.min(p, 0.999999)
  }

  /** avg(−log P3) over the document's trigrams; 0.0 for < 3 tokens. */
  def bits(text: String): Double = {
    val ts = TextHashing.tokensOf(text)
    if (ts.length < 3) return 0.0
    var s = 0.0
    var i = 2
    while (i < ts.length) {
      s -= math.log(prob3(ts(i - 2), ts(i - 1), ts(i)))
      i += 1
    }
    s / (ts.length - 2)
  }
}

case class Kn3BitsExpr(child: Expression, model: Kn3Model)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kn3_bits"
  override protected def nullSafeEval(input: Any): Any =
    model.bits(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("kn3Model", model, classOf[Kn3Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.bits($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): Kn3BitsExpr =
    copy(child = newChild)
}

case class KnBitsExpr(child: Expression, model: KnModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kn_bits"
  override protected def nullSafeEval(input: Any): Any =
    model.bits(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("knModel", model, classOf[KnModel].getName)
    defineCodeGen(ctx, ev, c => s"$m.bits($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): KnBitsExpr =
    copy(child = newChild)
}

object KnFunctions {
  def kn_bits(text: Column, model: KnModel): Column =
    ColumnBridge.column(KnBitsExpr(ColumnBridge.expression(text), model))
  def kn3_bits(text: Column, model: Kn3Model): Column =
    ColumnBridge.column(Kn3BitsExpr(ColumnBridge.expression(text), model))
}
