package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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

/** Streaming twin of [[graft.operators.Temporal.funnel]]: the same
  * first-anchor greedy semantics, advanced incrementally as events
  * arrive. Greedy matching is order-insensitive GIVEN event-time
  * -ordered delivery per user (the contract every stateful twin here
  * documents; within a micro-batch events are sorted by event time,
  * so only cross-batch disorder would diverge — bound it with a
  * watermark upstream if the transport reorders). State is one
  * ≤k-timestamp record per user; a hit row is emitted only when a
  * stage advances, so the output stream is append-only and tiny.
  */
object FunnelStream {

  def streaming(ds: Dataset[FunnelEvt], stages: Seq[String], windowUs: Long)
               (implicit spark: SparkSession): Dataset[FunnelHit] = {
    import spark.implicits._
    require(stages.size >= 2 && stages.distinct.size == stages.size)
    require(windowUs > 0)
    val stageIdx = stages.zipWithIndex.toMap
    ds.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvt], state: GroupState[FunnelSt]) =>
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
          if (times.nonEmpty) state.update(FunnelSt(times))
          out.iterator
      }
  }
}
