package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{ClassifierFunctions, ClassifierKernels}

/** fastText-style quality classifier (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification") — the standard
  * LLM-corpus filter: train a linear model to separate a
  * high-quality reference slice from the raw crawl, then keep
  * documents the model scores high (GPT-3's books/wiki-vs-crawl
  * filter, LLaMA's Wikipedia-reference filter both use exactly this
  * shape). Hashed bag-of-tokens features (no vocabulary build),
  * logistic loss, full-batch gradient descent.
  *
  * Distribution model per iteration: weights go OUT as a broadcast
  * (dim+1 doubles, ~256 KiB at 2^15 — once per executor, not per
  * task), gradients come BACK as one dense partial per partition.
  * Featurization runs once and is cached; each iteration is then a
  * single map-side pass with no shuffle of the corpus. This is the
  * classic Spark MLlib linear-model layout re-expressed on Dataset.
  *
  * Determinism: with `deterministic=true` (default) partial gradients
  * are collected WITH their partition id and summed in pid order, so
  * retrains are bit-identical at any core count (floating addition is
  * not commutative-associative; an unordered reduce is not). Driver
  * traffic is numPartitions × (dim+2) doubles — 256 MB at 1000
  * partitions/2^15 dim, so for full-cluster trains either coalesce
  * the (tiny, cached) feature frame first or flip to
  * `deterministic=false`, which tree-reduces partials in two hops and
  * only gives up last-ulp reproducibility.
  */
object Classifier {

  /** Train and return the weight vector (length dim+1; bias last).
    * Classical momentum (Polyak 1964) on the full-batch gradient —
    * each saved iteration is one fewer cluster-wide pass, so faster
    * convergence is a distributed-cost win, not just wall-clock.
    * `init` warm-starts from existing weights — the ONLINE/streaming
    * path: a foreachBatch loop trains a few iterations per
    * micro-batch on arriving labeled data and carries the weights
    * forward (mini-batch gradient descent in streaming clothes).
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 15, iters: Int = 30, lr: Double = 1.0,
      reg: Double = 1e-6, momentum: Double = 0.9,
      deterministic: Boolean = true,
      init: Option[Array[Double]] = None): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = docs
      .select(col(labelCol).cast("double").as("y"), col(textCol).cast("string").as("t"))
      .where(col("y").isNotNull && col("t").isNotNull)
      .as[(Double, String)]
      .mapPartitions(_.map { case (y, t) => (y, ClassifierKernels.featIdx(t, dim)) })
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = feats.count().toDouble
    require(n > 0, "empty training set")
    var w = init.map(_.clone()).getOrElse(new Array[Double](dim + 1))
    require(w.length == dim + 1, s"init weights must be dim+1 = ${dim + 1}")
    val vel = new Array[Double](dim + 1)
    try {
      var iter = 0
      while (iter < iters) {
        val bw = spark.sparkContext.broadcast(w)
        val grad =
          if (deterministic) {
            val partials = feats.rdd.mapPartitionsWithIndex { (pid, it) =>
              val g = new Array[Double](dim + 2)
              val wv = bw.value
              it.foreach { case (y, idxs) =>
                ClassifierKernels.accumGrad(g, wv, idxs, y, dim)
              }
              Iterator((pid, g))
            }.collect().sortBy(_._1)
            val g = new Array[Double](dim + 2)
            partials.foreach { case (_, p) =>
              var i = 0
              while (i < g.length) { g(i) += p(i); i += 1 }
            }
            g
          } else {
            feats.rdd.treeAggregate(new Array[Double](dim + 2))(
              seqOp = (g, row) => {
                ClassifierKernels.accumGrad(g, bw.value, row._2, row._1, dim); g
              },
              combOp = (a, b) => {
                var i = 0
                while (i < a.length) { a(i) += b(i); i += 1 }
                a
              },
              depth = 2)
          }
        val w2 = new Array[Double](dim + 1)
        var i = 0
        while (i <= dim) {
          val l2 = if (i == dim) 0.0 else reg * w(i) // bias unregularized
          vel(i) = momentum * vel(i) - lr * (grad(i) / n + l2)
          w2(i) = w(i) + vel(i)
          i += 1
        }
        w = w2
        bw.destroy()
        iter += 1
      }
    } finally feats.unpersist(blocking = false)
    w
  }

  /** Map-only corpus scoring with the trained weights (codegen). */
  def score(text: Column, weights: Array[Double], dim: Int = 1 << 15): Column =
    ClassifierFunctions.logistic_score(text, weights, dim)

  /** Persist trained weights as parquet — the train-once/score-many
    * production contract (pair of [[Knn.saveIvfIndex]]): the training
    * job pays the iteration cost, scoring jobs load dim+1 doubles.
    */
  def save(spark: org.apache.spark.sql.SparkSession,
           weights: Array[Double], path: String): Unit = {
    import spark.implicits._
    weights.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("idx", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load saved weights (ordered by index). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Array[Double] =
    spark.read.parquet(path).orderBy(col("idx"))
      .collect().map(_.getDouble(1))

  /** Train-accuracy of `weights` on a labeled frame (spec helper and
    * convergence telemetry; one map-only pass + a 2-value aggregate).
    */
  def accuracy(docs: DataFrame, textCol: String, labelCol: String,
      weights: Array[Double], dim: Int = 1 << 15): Double = {
    val pred = when(score(col(textCol), weights, dim) > 0.5, 1.0).otherwise(0.0)
    val row = docs.select(
      sum(when(pred === col(labelCol).cast("double"), 1L).otherwise(0L)).as("ok"),
      count(lit(1)).as("n")).head()
    row.getLong(0).toDouble / row.getLong(1)
  }
}
