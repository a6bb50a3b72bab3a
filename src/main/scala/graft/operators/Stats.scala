package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust statistics for monitoring pipelines — the alerting math a
  * rules engine applies to metric streams, expressed as batch
  * operators with exact SQL-replayable semantics.
  */
object Stats {

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
                     k: Double = 3.5): DataFrame = {
    require(k > 0, "k must be positive")
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed
      .select(col(groupCol), abs(col(valueCol) - col("med")).as("ad"))
      .groupBy(col(groupCol))
      .agg(percentile(col("ad"), lit(0.5)).as("mad"))
    val scale = lit(1.4826)
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("score",
        when(col("mad") > 0,
          round((col(valueCol) - col("med")) / (scale * col("mad")), 6)))
      .where(
        (col("mad") > 0 && abs(col("score")) > k) ||
        (col("mad") === 0 && col(valueCol) =!= col("med")))
  }
}
