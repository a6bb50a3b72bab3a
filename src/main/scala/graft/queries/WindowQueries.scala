package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's five window kinds re-expressed for batch (event-time
  * columns) — streaming twins live in graft.streaming. Reference:
  * /root/reference/docs/en_US/sqls/windows.md (tumbling/hopping/
  * sliding/session/count windows, filtered window inputs) and
  * /root/reference/docs/en_US/sqls/functions/window_functions.md.
  *
  * Scale notes: time windows groupBy (window, key) → hash shuffle that
  * partitions evenly at any SF; the sliding window uses a range frame
  * partitioned by user so state per partition is bounded by per-key
  * history; the count window uses two-pass partition-offset indexing
  * (range partition → per-partition counts → local row_number + offset)
  * so no stage ever sorts the whole table in one task.
  */
object WindowQueries {

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_tumble" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "60 seconds").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("w.start").cast("long").as("ws"), col("w.end").cast("long").as("we"),
          col("event_type"), col("n"), col("sum_val"))),

    "q_win_hop" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "120 seconds", "60 seconds").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("w.start").cast("long").as("ws"), col("n"), col("sum_val"))),

    "q_win_slide" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-60000000L, 0L)
      ev(s, d).withColumn("tus", unix_micros(col("ts")))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_60s"),
          round(sum(col("value")).over(w), 2).as("sum_60s"))
    }),

    // sliding window with look-ahead (reference SLIDINGWINDOW(unit,
    // size, delay): window covers [t-size, t+delay])
    "q_win_slide2" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-60000000L, 30000000L)
      ev(s, d).withColumn("tus", unix_micros(col("ts")))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_win"),
          round(sum(col("value")).over(w), 2).as("sum_win"))
    }),

    "q_win_session" -> ((s, d) =>
      ev(s, d)
        .groupBy(session_window(col("ts"), "3600 seconds").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("user_id"), col("sw.start").cast("long").as("session_start"),
          col("n"), col("sum_val"))),

    // Count window via two-pass partition-offset indexing (the
    // zipWithIndex pattern): range-partition on the order key, count per
    // partition (tiny), derive each partition's global offset with a
    // partition-count self-join (32×32 rows — no unpartitioned window),
    // then row_number *within* each partition + offset = global index.
    // No single-partition global sort — survives 100× scale.
    // localCheckpoint (not persist) pins the sampled range boundaries so
    // both passes see one layout, and its blocks are reclaimed by the
    // ContextCleaner once unreferenced — repeated invocations in a
    // long-lived engine don't accumulate session-lifetime cache entries.
    "q_win_count" -> ((s, d) => {
      val parts = ev(s, d)
        .repartitionByRange(col("event_id"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint(true)
      val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      val offsets = counts.as("a")
        .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
      val local = Window.partitionBy(col("pid")).orderBy(col("event_id"))
      parts.join(broadcast(offsets), "pid")
        .withColumn("rn", row_number().over(local) + col("off"))
        .withColumn("win_id", floor((col("rn") - 1) / 500))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"),
          min(col("event_id")).as("first_eid"), max(col("event_id")).as("last_eid"))
    }),

    "q_win_filter" -> ((s, d) =>
      ev(s, d).filter(col("event_type") === "click")
        .groupBy(window(col("ts"), "3600 seconds").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("w.start").cast("long").as("ws"), col("n"), col("sum_val"))),

    "q_win_rownum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
    }),

    // Conditional state window (reference pkg/ast/statement.go
    // STATE_WINDOW): per user, open at value > 100, close at value < 10.
    // Streaming twin: graft.streaming.ConditionWindow (StreamingSpec).
    "q_win_state" -> ((s, d) =>
      graft.streaming.ConditionWindow.batch(ev(s, d), "user_id", "ts", "event_id",
        "value", col("value") > 100, col("value") < 10)
        .select(col("user_id"), col("grp").cast("long").as("win_seq"),
          unix_micros(col("w_start")).as("ws"), unix_micros(col("w_end")).as("we"),
          col("n"), col("sum_val")))
  )

  val oracle: Map[String, String] = Map(
    "q_win_tumble" ->
      """SELECT CAST(floor(epoch(ts)/60)*60 AS BIGINT) AS ws,
        |  CAST(floor(epoch(ts)/60)*60+60 AS BIGINT) AS we,
        |  event_type, count(*) AS n, round(sum(value),2) AS sum_val
        |FROM events GROUP BY 1,2,3""".stripMargin,
    "q_win_hop" ->
      """SELECT CAST((floor(epoch(ts)/60) - k.k)*60 AS BIGINT) AS ws,
        |  count(*) AS n, round(sum(value),2) AS sum_val
        |FROM events CROSS JOIN (SELECT unnest(range(0, CAST(120/60 AS BIGINT))) AS k) k
        |GROUP BY 1""".stripMargin,
    "q_win_slide" ->
      """SELECT event_id, count(*) OVER w AS n_60s, round(sum(value) OVER w, 2) AS sum_60s
        |FROM (SELECT *, epoch_us(ts) AS tus FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_win_slide2" ->
      """SELECT event_id, count(*) OVER w AS n_win,
        |  round(sum(value) OVER w, 2) AS sum_win
        |FROM (SELECT *, epoch_us(ts) AS tus FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 60000000 PRECEDING AND 30000000 FOLLOWING)""".stripMargin,
    "q_win_session" ->
      """WITH x AS (
        |  SELECT user_id, ts, value, epoch(ts) AS es,
        |    lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |y AS (
        |  SELECT *, sum(CASE WHEN prev IS NULL OR es - prev >= 3600 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, CAST(floor(min(es)) AS BIGINT) AS session_start,
        |  count(*) AS n, round(sum(value),2) AS sum_val
        |FROM y GROUP BY user_id, sid""".stripMargin,
    "q_win_count" ->
      """WITH x AS (SELECT *, row_number() OVER (ORDER BY event_id) AS rn FROM events)
        |SELECT CAST(floor((rn-1)/500) AS BIGINT) AS win_id, count(*) AS n,
        |  round(sum(value),2) AS sum_val,
        |  min(event_id) AS first_eid, max(event_id) AS last_eid
        |FROM x GROUP BY 1""".stripMargin,
    "q_win_filter" ->
      """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws,
        |  count(*) AS n, round(sum(value),2) AS sum_val
        |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin,
    "q_win_rownum" ->
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,
    "q_win_state" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS open_f,
        |    CASE WHEN value < 10 THEN 1 ELSE 0 END AS close_f
        |  FROM events),
        |g AS (
        |  SELECT *, coalesce(sum(close_f) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
        |  FROM e),
        |o AS (
        |  SELECT *,
        |    max(open_f) OVER (PARTITION BY user_id, grp ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS opened,
        |    max(close_f) OVER (PARTITION BY user_id, grp) AS has_close
        |  FROM g)
        |SELECT user_id, CAST(grp AS BIGINT) AS win_seq,
        |  epoch_us(min(ts)) AS ws, epoch_us(max(ts)) AS we,
        |  count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM o WHERE opened = 1 AND has_close = 1
        |GROUP BY user_id, grp""".stripMargin
  )
}
