package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PcaFunctions

/** Distributed PCA over an embedding column — the standard compression
  * / whitening step before ANN indexing or embedding dedup at corpus
  * scale. The fit is ONE map-side pass: each partition accumulates the
  * count, coordinate sums, and the packed upper triangle of the Gram
  * matrix (dim·(dim+1)/2 doubles — 8 KiB at dim 128, independent of
  * row count), partials come back pid-ordered for a deterministic sum,
  * and the dim×dim eigenproblem solves on the driver with a cyclic
  * Jacobi iteration (Golub & Van Loan, "Matrix Computations" §8.5 —
  * the textbook symmetric eigensolver; dim ≤ a few hundred makes it
  * millisecond-cheap). The corpus is never shuffled and never visits
  * the driver; only the dim²-sized moments do — the same
  * driver-sees-parameters-only contract as the IVF centroid trainer.
  *
  * Projection/residual are codegen kernels with the model as a
  * referenced object — map-only, linear scale-out.
  */
object Pca {

  /** Fitted model: `components` is k×dim row-orthonormal (descending
    * eigenvalue order), `eigenvalues` the matching covariance spectrum,
    * `totalVariance` the trace (so dropped-variance = total − Σ top-k).
    */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double], totalVariance: Double, n: Long) {
    def explainedRatio: Array[Double] =
      eigenvalues.map(e => if (totalVariance > 0) e / totalVariance else 0.0)
  }

  /** One-pass moment fit; see class doc. `vecCol` may be any numeric
    * array column (float embeddings included).
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>")).where(col(vecCol).isNotNull)
      .as[Seq[Double]]
    val partials: Array[(Int, (Long, Array[Double], Array[Double]))] =
      vecs.rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        var sum: Array[Double] = null
        var gram: Array[Double] = null // packed upper triangle, row-major
        it.foreach { v =>
          val d = v.length
          if (sum == null) { sum = new Array[Double](d); gram = new Array[Double](d * (d + 1) / 2) }
          var i = 0
          var off = 0
          while (i < d) {
            val vi = v(i)
            sum(i) += vi
            var j = i
            while (j < d) { gram(off + j - i) += vi * v(j); j += 1 }
            off += d - i
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator((pid, (n, sum, gram)))
      }.collect().sortBy(_._1)
    require(partials.nonEmpty, "PCA fit over an empty frame")
    val dim = partials.head._2._2.length
    var n = 0L
    val sum = new Array[Double](dim)
    val gram = new Array[Double](dim * (dim + 1) / 2)
    partials.foreach { case (_, (pn, ps, pg)) =>
      n += pn
      var i = 0
      while (i < dim) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += pg(i); i += 1 }
    }
    val mean = sum.map(_ / n)
    // covariance: E[xxᵀ] − μμᵀ
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var off = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(off + j - i) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      off += dim - i
      i += 1
    }
    val (evals, evecs) = symEigen(cov)
    val total = evals.sum.max(0.0)
    val kk = math.min(k, dim)
    val comps = Array.tabulate(kk) { c =>
      val v = evecs(c)
      // deterministic sign: largest-|coordinate| entry is positive
      var best = 0
      var m = 0.0
      var t = 0
      while (t < v.length) { if (math.abs(v(t)) > m) { m = math.abs(v(t)); best = t }; t += 1 }
      if (v(best) < 0) v.map(-_) else v
    }
    PcaModel(mean, comps, evals.take(kk), total, n)
  }

  /** Centered projections onto the model's components (codegen).
    * `whiten = true` scales each component by 1/√λ so projections have
    * unit variance per axis — the standard decorrelating transform
    * before clustering or Euclidean ANN (components with λ ≤ 1e-12
    * are left unscaled rather than exploding).
    */
  def project(vec: Column, model: PcaModel, whiten: Boolean = false): Column = {
    val comps =
      if (!whiten) model.components
      else model.components.zip(model.eigenvalues).map { case (c, ev) =>
        if (ev > 1e-12) c.map(_ / math.sqrt(ev)) else c
      }
    PcaFunctions.pca_project(vec, model.mean, comps)
  }

  /** Squared rank-k reconstruction residual (codegen). */
  def residual(vec: Column, model: PcaModel): Column =
    PcaFunctions.pca_residual(vec, model.mean, model.components)

  /** Persist a fitted model as parquet (kind, idx, values): row -1 is
    * the mean + [totalVariance, n] tail; rows 0..k-1 are components
    * with their eigenvalue appended — fit-once/project-many, the same
    * contract as the ANN index persistence.
    */
  def save(spark: org.apache.spark.sql.SparkSession,
           model: PcaModel, path: String): Unit = {
    import spark.implicits._
    val rows = (-1, (model.mean :+ model.totalVariance :+ model.n.toDouble).toSeq) +:
      model.components.zipWithIndex.map { case (c, i) =>
        (i, (c :+ model.eigenvalues(i)).toSeq)
      }.toSeq
    rows.toDF("idx", "v").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a saved model. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): PcaModel = {
    val rows = spark.read.parquet(path).orderBy(col("idx"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val (meanRow, comps) = (rows.head._2, rows.tail)
    PcaModel(
      mean = meanRow.dropRight(2),
      components = comps.map(_._2.dropRight(1)),
      eigenvalues = comps.map(_._2.last),
      totalVariance = meanRow(meanRow.length - 2),
      n = meanRow.last.toLong)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, matching row eigenvectors). Destroys `a`.
    */
  private[graft] def symEigen(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    val maxSweeps = 64
    var off = offDiagNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (n * n)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(p)(i); val viq = v(q)(i)
              v(p)(i) = c * vip - s * viq
              v(q)(i) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i)).toArray)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
