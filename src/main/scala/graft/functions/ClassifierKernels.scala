package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-tokens logistic scoring — the inference half of
  * [[graft.operators.Classifier]] (fastText-style linear text
  * classifier, Joulin et al. 2016 "Bag of Tricks for Efficient Text
  * Classification"). The trained weight vector rides into the
  * generated code via addReferenceObj, so corpus scoring is one
  * map-only codegen loop per row: tokenize → hash → mean-pool weights
  * → sigmoid. No UDF, no per-element lambda, no driver involvement —
  * linear scale-out at 100 TB.
  *
  * Tokenization and hashing reuse [[TextHashing.tokenHashes]] (the
  * dedup/langid kernel), so train-side featurization and this scorer
  * can never disagree on a token's feature index.
  */
object ClassifierKernels {

  /** Feature indices of a document: token hash folded into [0, dim). */
  def featIdx(text: String, dim: Int): Array[Int] = {
    val hs = TextHashing.tokenHashes(text)
    val out = new Array[Int](hs.length)
    var i = 0
    while (i < hs.length) {
      out(i) = java.lang.Math.floorMod(hs(i), dim.toLong).toInt
      i += 1
    }
    out
  }

  @inline def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Mean-pooled linear margin: avg(w[idx]) + bias (w[dim]). */
  def margin(w: Array[Double], idxs: Array[Int], dim: Int): Double = {
    if (idxs.length == 0) return w(dim)
    var s = 0.0
    var i = 0
    while (i < idxs.length) { s += w(idxs(i)); i += 1 }
    s / idxs.length + w(dim)
  }

  /** P(label=1 | text) under the trained weights. */
  def scoreText(text: String, w: Array[Double], dim: Int): Double =
    sigmoid(margin(w, featIdx(text, dim), dim))

  /** Accumulate one document's logistic-loss gradient into `g`
    * (length dim+2: dim feature slots, bias, running log-loss).
    * Called from the training loop's per-partition pass.
    */
  def accumGrad(g: Array[Double], w: Array[Double], idxs: Array[Int],
      y: Double, dim: Int): Unit = {
    val p = sigmoid(margin(w, idxs, dim))
    val err = p - y
    if (idxs.length > 0) {
      val c = err / idxs.length
      var i = 0
      while (i < idxs.length) { g(idxs(i)) += c; i += 1 }
    }
    g(dim) += err
    val eps = 1e-12
    g(dim + 1) -= (if (y > 0.5) math.log(p + eps) else math.log(1.0 - p + eps))
  }
}

/** sigmoid(mean-pooled hashed-token weights + bias), one codegen call
  * per row; the weight vector is a referenced object, not a plan
  * literal (a 2^15-element array literal would bloat every serialized
  * task; a reference ships once per executor via the broadcast-like
  * task binary).
  */
case class LogisticScoreExpr(child: Expression, weights: Array[Double], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "logistic_score"
  override protected def nullSafeEval(input: Any): Any =
    ClassifierKernels.scoreText(input.asInstanceOf[UTF8String].toString, weights, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clfWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ClassifierKernels.scoreText($c.toString(), $ref, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): LogisticScoreExpr =
    copy(child = newChild)
}

object ClassifierFunctions {
  def logistic_score(text: Column, weights: Array[Double], dim: Int): Column =
    ColumnBridge.column(LogisticScoreExpr(ColumnBridge.expression(text), weights, dim))
}
