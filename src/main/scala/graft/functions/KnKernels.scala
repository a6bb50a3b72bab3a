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

  /** P(w2|w1) with full backoff; always in (0, 1). */
  def prob(w1: String, w2: String): Double = {
    val h = c1.get(w1)
    val base = pcont(w2)
    val p =
      if (h == null) base
      else {
        val cHist = h.longValue().toDouble
        val cBi = c2.get(w1 + " " + w2)
        val seen = if (cBi == null) 0.0 else math.max(cBi.longValue() - discount, 0.0)
        val conts = n1p.get(w1)
        val lambda = if (conts == null) 0.0 else discount * conts.longValue() / cHist
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
}
