package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user retention progress: the anchor timestamp (µs) and a
  * bitmask of offsets already reported — maxBuckets BITS per user, the
  * smallest possible streaming-retention state.
  */
final case class RetSt(anchorUs: Long, seenMask: Long)

/** One emitted row per FIRST activity of a user in an offset bucket:
  * (user, cohort, offset). Counting these per (cohort, offset)
  * downstream reproduces the batch retention table's n_active.
  */
final case class RetHit(user: Long, cohort: Long, offset: Long)

/** Streaming twin of [[graft.operators.Temporal.retention]]: the
  * anchor is the user's first `anchorType` event (event-time-ordered
  * delivery per user, the same contract as FunnelStream); each later
  * event inside the horizon emits a hit the FIRST time its offset
  * bucket is touched. State is (one long, one bitmask) per user —
  * maxBuckets ≤ 63 keeps the mask in a single long. Hits are
  * append-only, at most maxBuckets per user, so the downstream
  * count-per-(cohort, offset) aggregation state is bounded by the
  * cohort×offset grid, not the event volume.
  *
  * State lifetime: by default (expireState = false) one record per
  * DISTINCT anchored user is retained forever — bounded per key,
  * unbounded in keys (the matchPattern caveat). Pass
  * expireState = true to register an event-time timeout at
  * anchor + bucketUs·maxBuckets — the horizon beyond which no event
  * can emit another hit — and drop the record once the watermark
  * passes it. The trade: a user whose anchor event recurs AFTER
  * expiry re-cohorts at the later anchor, whereas the batch operator
  * cohorts once on the all-time first anchor; exact stream ≡ batch
  * holds only over horizons shorter than the expiry. The expiry path
  * runs under a zero-delay watermark, which also drops rows at or
  * below the previous batch's max event time (see FunnelStream).
  */
object RetentionStream {

  def streaming(ds: Dataset[FunnelEvt], anchorType: String,
                bucketUs: Long, maxBuckets: Int,
                expireState: Boolean = false)
               (implicit spark: SparkSession): Dataset[RetHit] = {
    import spark.implicits._
    require(bucketUs > 0 && maxBuckets >= 1 && maxBuckets <= 63)
    def core(user: Long, it: Iterator[FunnelEvt],
             state: GroupState[RetSt]): Iterator[RetHit] =
      if (expireState && state.hasTimedOut) {
        // watermark passed the retention horizon: every future
        // event fails the ts < anchor + horizon check anyway
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.getOrElse(RetSt(Long.MinValue, 0L))
        val out = scala.collection.mutable.ListBuffer[RetHit]()
        // anchor-first at equal timestamps: the batch operator
        // counts a same-µs activity event (ts >= t0), so the anchor
        // must be applied before its co-timestamped siblings
        it.toSeq.sortBy(e =>
          (e.tsMicros, if (e.etype == anchorType) 0 else 1)).foreach { e =>
          if (st.anchorUs == Long.MinValue) {
            // not yet cohorted: only the anchor event type starts it
            if (e.etype == anchorType) st = RetSt(e.tsMicros, 0L)
          }
          if (st.anchorUs != Long.MinValue && e.tsMicros >= st.anchorUs &&
              e.tsMicros < st.anchorUs + bucketUs * maxBuckets) {
            val off = (e.tsMicros - st.anchorUs) / bucketUs
            if ((st.seenMask & (1L << off)) == 0L) {
              st = st.copy(seenMask = st.seenMask | (1L << off))
              // floorDiv matches the batch operator's floor() for
              // pre-epoch (negative) anchors; offset is nonnegative
              // by the ts >= anchor guard, so plain division is fine
              out += RetHit(user, Math.floorDiv(st.anchorUs, bucketUs), off)
            }
          }
        }
        if (st.anchorUs != Long.MinValue) {
          state.update(st)
          if (expireState) {
            val deadMs = Math.floorDiv(
              st.anchorUs + bucketUs * maxBuckets, 1000L) + 1L
            state.setTimeoutTimestamp(
              math.max(deadMs, state.getCurrentWatermarkMs() + 1L))
          }
        }
        out.iterator
      }
    if (!expireState)
      ds.groupByKey(_.user)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(core)
    else
      // the TimestampType twin column must survive INTO the stateful
      // operator (pruning it prunes the watermark node itself)
      ds.withColumn("ets", timestamp_micros(col("tsMicros")))
        .withWatermark("ets", "0 seconds").as[FunnelEvtW]
        .groupByKey(_.user)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
          (user: Long, it: Iterator[FunnelEvtW], state: GroupState[RetSt]) =>
            core(user, it.map(w => FunnelEvt(w.user, w.tsMicros, w.etype)), state)
        }
  }
}
