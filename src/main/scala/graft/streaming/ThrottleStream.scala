package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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

/** Streaming twin of [[graft.operators.Temporal.throttle]]: pass an
  * event through iff its (key, time-bucket) has passed fewer than
  * `maxPerBucket` so far. Under event-time-ordered delivery per key
  * (the stateful-twin contract here) the passed set is exactly the
  * batch operator's first-N-per-bucket. A bucket rollover resets the
  * counter, so state NEVER grows with history — it is constant per
  * key.
  */
object ThrottleStream {

  def streaming(ds: Dataset[ThEvt], bucketUs: Long, maxPerBucket: Int)
               (implicit spark: SparkSession): Dataset[ThEvt] = {
    import spark.implicits._
    require(bucketUs > 0 && maxPerBucket >= 1)
    ds.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[ThEvt], state: GroupState[ThSt]) =>
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
          out.iterator
      }
  }
}
