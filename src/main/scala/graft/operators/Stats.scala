package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust statistics for monitoring pipelines — the alerting math a
  * rules engine applies to metric streams, expressed as batch
  * operators with exact SQL-replayable semantics.
  */
object Stats {

  /** Column statistics for cost-based planning: row count, exact NDV,
    * and an equi-depth histogram (bucket boundaries at the exact
    * interpolated i/buckets quantiles — every bucket holds ~n/buckets
    * rows, so selectivity of a range predicate reads directly off the
    * covered buckets). The sibling of [[Cms.joinSizeEstimate]]: that
    * one prices the join, this one prices the filter. Returns one row
    * per bucket: (bucket, lo, hi, n_rows, ndv).
    *
    * Scale shape: ONE aggregation — the exact percentile and exact
    * distinct are the oracle-able choices; at 100 TB swap
    * approx_percentile + the HLL sketch (both already here) for the
    * one-pass mergeable variant and keep this as the auditor.
    */
  def columnStats(df: DataFrame, valueCol: String, buckets: Int = 8): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val fractions = (0 to buckets).map(_.toDouble / buckets)
    df.agg(
        percentile(col(valueCol), typedlit(fractions)).as("cuts"),
        count(col(valueCol)).as("n_rows"),
        countDistinct(col(valueCol)).as("ndv"))
      .select(col("n_rows"), col("ndv"),
        posexplode(zip_with(
          slice(col("cuts"), 1, buckets), slice(col("cuts"), 2, buckets),
          (a, b) => struct(a.as("lo"), b.as("hi")))).as(Seq("bucket", "bnd")))
      .select(col("bucket").cast("int").as("bucket"),
        round(col("bnd.lo"), 6).as("lo"), round(col("bnd.hi"), 6).as("hi"),
        col("n_rows"), col("ndv"))
  }

  /** Median/MAD outlier detection (the robust z-score — Iglewicz &
    * Hoaglin's |0.6745·(x−med)/MAD| test, rendered with the standard
    * 1.4826 consistency constant): per group, median and the median
    * absolute deviation; rows with |x − med| > k·1.4826·MAD flag as
    * outliers. Unlike mean/σ, one wild value cannot drag the
    * threshold toward itself (breakdown point 50%). Groups with
    * MAD = 0 (a majority-constant metric) flag every off-median row —
    * the convention that makes a stuck-then-jumps sensor alert.
    * Returns the flagged rows with (med, mad, score).
    *
    * Scale shape: TWO exact-percentile aggregations on the group key
    * (median, then MAD — exact medians need the in-group sort; both
    * fold to one row per group) and two broadcast joins back; the
    * corpus itself never shuffles. For a first-pass filter at
    * 100 TB swap `percentile` for `approx_percentile` upstream and
    * keep this exact pass for the flagged slice.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     k: Double = 3.5): DataFrame =
    flagAgainst(df, robustThresholds(df, groupCol, valueCol),
      groupCol, valueCol, k)

  /** The training half: one (med, mad) row per group — the threshold
    * table an alerting pipeline computes on a batch window and then
    * serves against live traffic.
    */
  def robustThresholds(df: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    df.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), col("med"),
        abs(col(valueCol) - col("med")).as("ad"))
      .groupBy(col(groupCol), col("med"))
      .agg(percentile(col("ad"), lit(0.5)).as("mad"))
  }

  /** The serving half: flag rows against a PRECOMPUTED threshold
    * table — a broadcast join + map-side arithmetic, so the same
    * expression gates a static frame or a stream (the batch operator
    * is literally flagAgainst(df, robustThresholds(df))).
    */
  def flagAgainst(df: DataFrame, thresholds: DataFrame, groupCol: String,
                  valueCol: String, k: Double = 3.5): DataFrame = {
    require(k > 0, "k must be positive")
    val scale = lit(1.4826)
    df.join(broadcast(thresholds), Seq(groupCol))
      .withColumn("score",
        when(col("mad") > 0,
          round((col(valueCol) - col("med")) / (scale * col("mad")), 6)))
      .where(
        (col("mad") > 0 && abs(col("score")) > k) ||
        (col("mad") === 0 && col(valueCol) =!= col("med")))
  }
}
