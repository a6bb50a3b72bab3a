package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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
  */
object RetentionStream {

  def streaming(ds: Dataset[FunnelEvt], anchorType: String,
                bucketUs: Long, maxBuckets: Int)
               (implicit spark: SparkSession): Dataset[RetHit] = {
    import spark.implicits._
    require(bucketUs > 0 && maxBuckets >= 1 && maxBuckets <= 63)
    ds.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvt], state: GroupState[RetSt]) =>
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
          if (st.anchorUs != Long.MinValue) state.update(st)
          out.iterator
      }
  }
}
