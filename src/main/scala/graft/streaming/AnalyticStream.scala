package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for streaming analytics: keyed, timestamped numeric +
  * categorical value (the shape of eKuiper's per-stream rows after
  * projection).
  */
final case class AnEvt(key: Long, tsMicros: Long, value: Double, tag: String)

final case class AnState(lastValue: Double, hasLast: Boolean,
                         latestTag: String, lastTag: String, hasLastTag: Boolean,
                         accSum: Double, accCnt: Long, accMin: Double, accMax: Double)

final case class AnOut(key: Long, tsMicros: Long,
                       lagVal: Option[Double], latestTag: Option[String],
                       hadChanged: Boolean,
                       accSum: Double, accCnt: Long, accMin: Double, accMax: Double)

/** Streaming twins of the reference's analytic functions (SURVEY §2.4;
  * funcs_analytic.go): lag, latest (last non-null), had_changed and the
  * acc_* running accumulators, as one flatMapGroupsWithState operator.
  * One small AnState record per key lives in Spark's state store —
  * horizontally partitioned, checkpointed; events are processed in
  * event-time order within each micro-batch. StreamingSpec pins the
  * output equal to the batch window-function formulation on identical
  * data fed across multiple batches.
  */
object AnalyticStream {

  def streaming(ds: Dataset[AnEvt])(implicit spark: SparkSession): Dataset[AnOut] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[AnEvt], state: GroupState[AnState]) =>
          var st = state.getOption.getOrElse(AnState(
            lastValue = 0.0, hasLast = false,
            latestTag = null, lastTag = null, hasLastTag = false,
            accSum = 0.0, accCnt = 0L,
            accMin = Double.PositiveInfinity, accMax = Double.NegativeInfinity))
          val out = scala.collection.mutable.ListBuffer[AnOut]()
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            val lag = if (st.hasLast) Some(st.lastValue) else None
            val changed = !st.hasLastTag || st.lastTag != e.tag
            val latest = Option(if (e.tag != null) e.tag else st.latestTag)
            val sum = st.accSum + e.value
            val cnt = st.accCnt + 1
            val mn = math.min(st.accMin, e.value)
            val mx = math.max(st.accMax, e.value)
            out += AnOut(key, e.tsMicros, lag, latest, changed,
              math.rint(sum * 100) / 100, cnt, mn, mx)
            st = AnState(e.value, hasLast = true,
              latestTag = latest.orNull, lastTag = e.tag, hasLastTag = true,
              accSum = sum, accCnt = cnt, accMin = mn, accMax = mx)
          }
          state.update(st)
          out.iterator
      }
  }
}
