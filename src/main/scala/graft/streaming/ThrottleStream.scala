package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed, timestamped event with a unique id — the id is the same-µs
  * tie-breaker the batch throttle ranks by, so the twin passes
  * EXACTLY the same rows, not just the same counts.
  */
final case class ThEvt(user: Long, tsMicros: Long, id: Long, etype: String)

/** Per-key throttle progress: the time bucket currently being counted
  * and how many events it has passed — two longs per key, the
  * entirety of streaming rate-limiter state.
  */
final case class ThSt(bucket: Long, n: Int)

/** Internal wire row for the expireState path: the event plus its
  * TimestampType twin of tsMicros (see FunnelEvtW).
  */
final case class ThEvtW(user: Long, tsMicros: Long, id: Long, etype: String,
                        ets: java.sql.Timestamp)

/** Streaming twin of [[graft.operators.Temporal.throttle]]: pass an
  * event through iff its (key, time-bucket) has passed fewer than
  * `maxPerBucket` so far. Under event-time-ordered delivery per key
  * (the stateful-twin contract here) the passed set is exactly the
  * batch operator's first-N-per-bucket. A bucket rollover resets the
  * counter, so state NEVER grows with history — it is constant per
  * key.
  *
  * State lifetime: by default (expireState = false) one record per
  * DISTINCT key is retained forever — constant per key, unbounded in
  * keys (the matchPattern caveat). Pass expireState = true to
  * register an event-time timeout at the current bucket's end and
  * drop the record once the watermark passes it. Unlike the funnel/
  * retention twins this expiry is exactly semantics-preserving under
  * GLOBALLY ordered delivery: any event arriving after the watermark
  * passed the bucket end lands in a LATER bucket, which resets the
  * counter regardless of whether the old record was still there.
  * The expiry path runs under a zero-delay watermark, which also
  * drops rows at or below the previous batch's max event time across
  * ALL keys (see FunnelStream) — i.e. it enforces GLOBAL event-time
  * ordering, a strictly stronger contract than the per-key ordering
  * the stateless path needs: with expireState a time-lagging key's
  * in-order events can be dropped by a faster key's watermark.
  */
object ThrottleStream {

  def streaming(ds: Dataset[ThEvt], bucketUs: Long, maxPerBucket: Int,
                expireState: Boolean = false)
               (implicit spark: SparkSession): Dataset[ThEvt] = {
    import spark.implicits._
    require(bucketUs > 0 && maxPerBucket >= 1)
    def core(user: Long, it: Iterator[ThEvt],
             state: GroupState[ThSt]): Iterator[ThEvt] =
      if (expireState && state.hasTimedOut) {
        // watermark passed the bucket end: the next event for this
        // key is in a later bucket and would reset the counter
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.getOrElse(ThSt(Long.MinValue, 0))
        val out = scala.collection.mutable.ListBuffer[ThEvt]()
        it.toSeq.sortBy(e => (e.tsMicros, e.id)).foreach { e =>
          // floorDiv, not /: Long division truncates toward zero and
          // would merge pre-epoch timestamps into the wrong bucket,
          // diverging from the batch operator's SQL floor()
          val b = Math.floorDiv(e.tsMicros, bucketUs)
          if (b != st.bucket) st = ThSt(b, 0)
          if (st.n < maxPerBucket) {
            st = st.copy(n = st.n + 1)
            out += e
          }
        }
        state.update(st)
        if (expireState && st.bucket != Long.MinValue) {
          // end of the counted bucket, in ms, ceil'd; never behind
          // the current watermark (setTimeoutTimestamp rejects that)
          val deadMs =
            Math.floorDiv((st.bucket + 1L) * bucketUs, 1000L) + 1L
          state.setTimeoutTimestamp(
            math.max(deadMs, state.getCurrentWatermarkMs() + 1L))
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
        .withWatermark("ets", "0 seconds").as[ThEvtW]
        .groupByKey(_.user)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
          (user: Long, it: Iterator[ThEvtW], state: GroupState[ThSt]) =>
            core(user, it.map(w => ThEvt(w.user, w.tsMicros, w.id, w.etype)), state)
        }
  }
}
