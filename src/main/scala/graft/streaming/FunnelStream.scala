package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for the streaming funnel: user, event-time µs, type. */
final case class FunnelEvt(user: Long, tsMicros: Long, etype: String)

/** Per-user funnel progress: timestamps of the matched stages so far
  * (head = the anchor). ≤ stages.size longs per user in the state
  * store — bounded regardless of how many events the user produces.
  */
final case class FunnelSt(times: List[Long])

/** One emitted row per stage ADVANCE (append-mode friendly): the user
  * reached `stage` at `tsMicros`. Downstream per-stage counts over
  * these hits reproduce the batch funnel table.
  */
final case class FunnelHit(user: Long, stage: Int, tsMicros: Long)

/** Internal wire row for the expireState path: the event plus its
  * TimestampType twin of tsMicros — the event-time column must ride
  * THROUGH the stateful operator or the watermark node is pruned away
  * and EventTimeTimeout refuses to plan.
  */
final case class FunnelEvtW(user: Long, tsMicros: Long, etype: String,
                            ets: java.sql.Timestamp)

/** Streaming twin of [[graft.operators.Temporal.funnel]]: the same
  * first-anchor greedy semantics, advanced incrementally as events
  * arrive. Greedy matching is order-insensitive GIVEN event-time
  * -ordered delivery per user (the contract every stateful twin here
  * documents; within a micro-batch events are sorted by event time,
  * so only cross-batch disorder would diverge — bound it with a
  * watermark upstream if the transport reorders). State is one
  * ≤k-timestamp record per user; a hit row is emitted only when a
  * stage advances, so the output stream is append-only and tiny.
  *
  * State lifetime: by default (expireState = false) one record per
  * DISTINCT user is retained forever — per-key state is tiny but the
  * key population is unbounded, so a long-running query over an
  * open-ended user id space grows its state store without limit (the
  * same caveat [[graft.operators.Temporal.matchPattern]] documents
  * for per-entity CEP). Pass expireState = true to register an
  * event-time timeout at anchor + windowUs — the moment no future
  * event can advance the funnel (every advance requires
  * ts ≤ anchor + windowUs) — and drop the record when the watermark
  * passes it. The trade: a user who re-enters AFTER expiry
  * re-anchors and re-emits stage hits, whereas the batch operator
  * anchors once per user on the all-time first stage-1 event; exact
  * stream ≡ batch holds only over horizons shorter than the expiry.
  * The expiry path runs under a zero-delay watermark, which also
  * DROPS rows at or below the previous batch's max event time — i.e.
  * it enforces the ordered-delivery contract instead of assuming it.
  */
object FunnelStream {

  def streaming(ds: Dataset[FunnelEvt], stages: Seq[String], windowUs: Long,
                expireState: Boolean = false)
               (implicit spark: SparkSession): Dataset[FunnelHit] = {
    import spark.implicits._
    require(stages.size >= 2 && stages.distinct.size == stages.size)
    require(windowUs > 0)
    val stageIdx = stages.zipWithIndex.toMap
    def core(user: Long, it: Iterator[FunnelEvt],
             state: GroupState[FunnelSt]): Iterator[FunnelHit] =
      if (expireState && state.hasTimedOut) {
        // watermark passed anchor + windowUs: no event can advance
        // this funnel any more — the record is dead weight
        state.remove()
        Iterator.empty
      } else {
        var times = state.getOption.map(_.times).getOrElse(Nil)
        val out = scala.collection.mutable.ListBuffer[FunnelHit]()
        it.toSeq.sortBy(_.tsMicros).foreach { e =>
          stageIdx.get(e.etype).foreach { k =>
            val depth = times.length
            // only the NEXT stage can advance; strict-after +
            // anchor-window checks mirror the batch operator
            if (k == depth && depth < stages.length) {
              val ok = depth == 0 ||
                (e.tsMicros > times.last &&
                  e.tsMicros <= times.head + windowUs)
              if (ok) {
                times = times :+ e.tsMicros
                out += FunnelHit(user, depth + 1, e.tsMicros)
              }
            }
          }
        }
        if (times.nonEmpty) {
          state.update(FunnelSt(times))
          if (expireState) {
            // ms, ceil'd past the window end; never behind the
            // current watermark (setTimeoutTimestamp rejects that)
            val deadMs = Math.floorDiv(times.head + windowUs, 1000L) + 1L
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
          (user: Long, it: Iterator[FunnelEvtW], state: GroupState[FunnelSt]) =>
            core(user, it.map(w => FunnelEvt(w.user, w.tsMicros, w.etype)), state)
        }
  }
}
