package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for the stateful window operators: a keyed, timestamped
  * value with pre-evaluated open/close predicates (predicates are
  * Columns in SQL space; they arrive here as booleans so the state
  * logic is engine-agnostic).
  */
final case class StateEvt(key: Long, tsMicros: Long, value: Double,
                          open: Boolean, close: Boolean)
final case class CondState(open: Boolean, n: Long, sum: Double, startTs: Long)
final case class CondWindowOut(key: Long, startTs: Long, endTs: Long,
                               n: Long, sum: Double)

final case class CountAccum(n: Long, sum: Double, emitted: Long)
final case class CountWindowOut(key: Long, windowSeq: Long, n: Long, sum: Double)

/** eKuiper's conditional state window (pkg/ast/statement.go STATE_WINDOW;
  * trigger conditions internal/topo/node/window_op.go:131): per key, a
  * window OPENS at the first row satisfying `open` (when none is open),
  * accumulates rows while open, CLOSES at a row satisfying `close`
  * (row included) and emits one aggregate row.
  *
  * Two implementations with identical semantics:
  *  - batch: pure window functions (close-count grouping) — DuckDB-
  *    oracle-checked as q_win_state.
  *  - streaming: flatMapGroupsWithState — state is one (open, n, sum,
  *    start) record per key in Spark's state store, so it scales
  *    horizontally and is fault-tolerant via checkpointing. Events are
  *    processed in event-time order within each micro-batch (the
  *    reference processes arrival order; we sort each batch by ts).
  */
object ConditionWindow {

  /** Batch analog. `open`/`close` are boolean expressions over the
    * input columns; ties in `tsCol` are broken by `tieCol` so the
    * sequential semantics are deterministic.
    */
  def batch(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            valueCol: String, open: Column, close: Column): DataFrame = {
    val ord = Seq(col(tsCol), col(tieCol))
    val prevRows = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grpSoFar = Window.partitionBy(col(keyCol), col("grp")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val grpAll = Window.partitionBy(col(keyCol), col("grp"))
    df.withColumn("open_f", open.cast("int"))
      .withColumn("close_f", close.cast("int"))
      .withColumn("grp", coalesce(sum(col("close_f")).over(prevRows), lit(0L)))
      .withColumn("opened", max(col("open_f")).over(grpSoFar))
      .withColumn("has_close", max(col("close_f")).over(grpAll))
      .where(col("opened") === 1 && col("has_close") === 1)
      .groupBy(col(keyCol), col("grp"))
      .agg(
        min(col(tsCol)).as("w_start"),
        max(col(tsCol)).as("w_end"),
        count(lit(1)).as("n"),
        round(sum(col(valueCol)), 2).as("sum_val"))
  }

  /** Streaming twin over typed events. One CondState per key in the
    * state store; emits on close. Unclosed windows persist across
    * micro-batches (and would time out via GroupStateTimeout in a
    * production rule with TTL options).
    */
  def streaming(ds: Dataset[StateEvt])(implicit spark: SparkSession): Dataset[CondWindowOut] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[StateEvt], state: GroupState[CondState]) =>
          var st = state.getOption.getOrElse(CondState(open = false, 0, 0.0, 0L))
          val out = scala.collection.mutable.ListBuffer[CondWindowOut]()
          it.toSeq.sortBy(e => (e.tsMicros, e.value)).foreach { e =>
            if (!st.open && e.open)
              st = CondState(open = true, 0, 0.0, e.tsMicros)
            if (st.open) {
              st = st.copy(n = st.n + 1, sum = st.sum + e.value)
              if (e.close) {
                out += CondWindowOut(key, st.startTs, e.tsMicros, st.n,
                  math.rint(st.sum * 100) / 100)
                st = CondState(open = false, 0, 0.0, 0L)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

/** eKuiper's count window (docs/en_US/sqls/windows.md COUNTWINDOW(n)):
  * per key, emit one aggregate row for every `size` events, in
  * processing order. flatMapGroupsWithState keeps an (n, sum)
  * accumulator per key; emission is deterministic given arrival order
  * (batches sorted by event time here, like ConditionWindow).
  */
object CountWindowStream {
  def streaming(ds: Dataset[StateEvt], size: Int)
               (implicit spark: SparkSession): Dataset[CountWindowOut] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[StateEvt], state: GroupState[CountAccum]) =>
          var st = state.getOption.getOrElse(CountAccum(0, 0.0, 0))
          val out = scala.collection.mutable.ListBuffer[CountWindowOut]()
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            st = st.copy(n = st.n + 1, sum = st.sum + e.value)
            if (st.n >= size) {
              out += CountWindowOut(key, st.emitted, st.n, math.rint(st.sum * 100) / 100)
              st = CountAccum(0, 0.0, st.emitted + 1)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

final case class SlideState(buf: Vector[(Long, Double)])
final case class SlideOut(key: Long, tsMicros: Long, n: Long, sum: Double)

/** eKuiper's sliding window (docs/en_US/sqls/windows.md SLIDINGWINDOW):
  * per event, aggregate over the trailing `windowMicros` of that key's
  * stream. Streaming state = the per-key event buffer pruned to the
  * window span (bounded by rate × span, the same bound the reference's
  * in-memory window holds). Batch analog: q_win_slide's range frame.
  */
object SlidingWindowStream {
  def streaming(ds: Dataset[StateEvt], windowMicros: Long)
               (implicit spark: SparkSession): Dataset[SlideOut] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[StateEvt], state: GroupState[SlideState]) =>
          var buf = state.getOption.map(_.buf).getOrElse(Vector.empty)
          val out = scala.collection.mutable.ListBuffer[SlideOut]()
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            buf = (buf :+ (e.tsMicros, e.value))
              .dropWhile { case (ts, _) => ts < e.tsMicros - windowMicros }
            out += SlideOut(key, e.tsMicros, buf.size.toLong,
              math.rint(buf.map(_._2).sum * 100) / 100)
          }
          state.update(SlideState(buf))
          out.iterator
      }
  }
}

/** Streaming twins of the batch time windows (q_win_tumble/hop/
  * session): same grouping expressions on a readStream with a
  * watermark. StreamingSpec pins streaming output == batch output on
  * identical data.
  */
object StreamingWindows {
  def tumbleAgg(df: DataFrame, tsCol: String, valueCol: String, size: String,
                keys: Seq[String], watermark: String = "0 seconds"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size).as("w") +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sum_val"))
      .select(col("w.start").cast("long").as("ws") +: keys.map(col) :+
        col("n") :+ col("sum_val"): _*)

  def hopAgg(df: DataFrame, tsCol: String, valueCol: String, size: String,
             slide: String, keys: Seq[String], watermark: String = "0 seconds"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size, slide).as("w") +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sum_val"))
      .select(col("w.start").cast("long").as("ws") +: keys.map(col) :+
        col("n") :+ col("sum_val"): _*)

  def sessionAgg(df: DataFrame, tsCol: String, valueCol: String, gap: String,
                 keys: Seq[String], watermark: String = "0 seconds"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sw") +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sum_val"))
      .select(keys.map(col) :+ col("sw.start").cast("long").as("session_start") :+
        col("n") :+ col("sum_val"): _*)
}
