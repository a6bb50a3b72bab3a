package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's analytic functions (lag, latest, changed_col,
  * had_changed, acc_*) and aggregate extensions (collect, last_value,
  * deduplicate, median/percentile/stddev/var) in their batch form:
  * window functions over (user, event-time) order. Streaming twins use
  * mapGroupsWithState. Reference: funcs_analytic.go, funcs_agg.go,
  * docs/en_US/sqls/functions/{analytic,aggregate}_functions.md.
  *
  * Scale: every window is partitioned by user key — per-key state only,
  * no global sort; aggregations are partial-agg friendly.
  */
object AnalyticQueries {

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")
  private def byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // lag + latest (last non-null seen so far)
    "q_analytic" -> ((s, d) => {
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d).select(
        col("event_id"),
        lag(col("value"), 1).over(byUser).as("prev_val"),
        last(nullif(col("event_type"), lit("view")), ignoreNulls = true)
          .over(run).as("latest_nonview"))
    }),

    // had_changed / changed_col / changed_cols over per-user event
    // stream. changed_cols (multi_column_functions.md): only the
    // columns whose value changed since the previous row — expressed
    // as a pruned map (JSON-serialized for the oracle compare).
    "q_analytic_changed" -> ((s, d) => {
      val prevT = lag(col("event_type"), 1).over(byUser)
      val prevV = lag(col("value"), 1).over(byUser)
      val tChanged = prevT.isNull || prevT =!= col("event_type")
      val vChanged = prevV.isNull || prevV =!= col("value")
      ev(s, d).select(
        col("event_id"),
        tChanged.as("had_changed"),
        when(tChanged, col("event_type")).as("changed_val"),
        to_json(map_filter(
          map(lit("event_type"), when(tChanged, col("event_type")),
              lit("value"), when(vChanged, col("value").cast("string"))),
          (_, v) => v.isNotNull)).as("changed_cols"))
    }),

    // acc_sum / acc_count / acc_avg / acc_min / acc_max running accumulators
    "q_acc" -> ((s, d) => {
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d).select(
        col("event_id"),
        // acc_avg = acc_sum/acc_cnt is pinned by the two columns below;
        // the rounded quotient itself lands on exact decimal-halfway
        // values (2-dec sums / 2^k counts) where engines' round() differ.
        round(sum(col("value")).over(run), 2).as("acc_sum"),
        count(lit(1)).over(run).as("acc_cnt"),
        min(col("value")).over(run).as("acc_min"),
        max(col("value")).over(run).as("acc_max"))
    }),

    // collect + last_value/first over groups. The collected list is
    // serialized with to_json so the driver's comparator (and DuckDB)
    // hash a string, not a nested array; values rounded to 2dp so both
    // engines print identical shortest-decimal JSON numbers.
    "q_agg_collect" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id")).agg(
        to_json(sort_array(collect_list(round(col("value"), 2)))).as("vals"),
        min_by(col("value"), col("event_id")).as("first_val"),
        max_by(col("value"), col("event_id")).as("last_val"),
        count(lit(1)).as("n"))),

    // median / percentile / percentile_disc / stddev(s) / var(s)
    "q_agg_stats" -> ((s, d) =>
      Tables(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        round(median(col("l_quantity")), 6).as("med"),
        round(percentile_approx(col("l_quantity"), lit(0.9), lit(1000000)), 6).as("p90_disc"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_cont"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_samp"),
        round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
        round(var_samp(col("l_quantity")), 6).as("v_samp"),
        round(var_pop(col("l_quantity")), 6).as("v_pop"))),

    // merge_agg: merge per-row objects over the group, last write wins
    // per key (reference funcs_agg.go merge_agg). Expressed as: last
    // value per (group, key) by event order, assembled into one map.
    // Two-level partial-agg-friendly plan — no row-at-a-time fold.
    "q_agg_obj" -> ((s, d) =>
      ev(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(round(max_by(col("value"), col("event_id")), 2).as("v"))
        .groupBy(col("user_id"))
        .agg(to_json(map_from_entries(
          sort_array(collect_list(struct(col("event_type"), col("v"))))))
          .as("merged"))),

    // deduplicate(keep-first) per key group
    "q_dedup_keyed" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"), col("event_type")).agg(
        min(col("event_id")).as("first_eid"),
        min_by(col("value"), col("event_id")).as("first_val"))),

    // last_hit_count / last_hit_time / delay (reference funcs_analytic
    // .go, funcs_misc.go delay): the rule-state functions in their
    // batch/event-time form. "hit" = the rule condition (value > 100)
    // fired; the running count/last-fire-time are per-user window
    // accumulators; delay(value, 1) is the value one event back.
    "q_analytic_hits" -> ((s, d) => {
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hit = when(col("value") > 100, 1L).otherwise(0L)
      ev(s, d).select(
        col("event_id"),
        sum(hit).over(run).as("last_hit_count"),
        // coalesce to -1: a nullable BIGINT would be promoted to float64
        // by the driver's pandas hasher and hash-mismatch vs DuckDB even
        // when values are identical.
        coalesce(
          max(when(col("value") > 100, unix_micros(col("ts")))).over(run),
          lit(-1L)).as("last_hit_time"),
        lag(col("value"), 1).over(byUser).as("delayed_val"))
    }),

    // last_agg_hit_count / last_agg_hit_time (funcs_inc_agg.go /
    // funcs_agg.go): per windowed-agg emission, how many prior window
    // results fired the rule condition and when the last one fired —
    // window accumulators over the (tiny) aggregated stream.
    "q_agg_hits" -> ((s, d) => {
      val agg = ev(s, d)
        .groupBy(window(col("ts"), "3600 seconds").as("w"), col("user_id"))
        .agg(round(sum(col("value")), 2).as("sum_val"))
        .select(col("user_id"), col("w.start").cast("long").as("ws"), col("sum_val"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ws"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // threshold 150 (not 500): at sf0.01 hourly per-user sums top out
      // well under 500, so the accumulator would never fire and the
      // query would exercise nothing. coalesce(-1) keeps the BIGINT
      // non-nullable for the driver's hasher.
      agg.withColumn("hit", when(col("sum_val") > 150, 1L).otherwise(0L))
        .select(col("user_id"), col("ws"),
          sum(col("hit")).over(run).as("last_agg_hit_count"),
          coalesce(max(when(col("hit") === 1, col("ws"))).over(run), lit(-1L))
            .as("last_agg_hit_time"))
    })
  )

  /** The analytic functions again, but entering through RULE SQL in the
    * reference's own dialect (rules/AnalyticSql.scala rewrite): the
    * same eKuiper names + OVER (PARTITION BY ... WHEN ...) grammar a
    * migrated rule would use, planned as Spark window expressions and
    * verified against a DuckDB window-SQL oracle. event_id is the
    * arrival-order column (unique, so both engines order identically).
    */
  val sqlDialect: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_analytic_sql" -> ((s, d) => {
      ev(s, d).createOrReplaceTempView("events_asql")
      val sql =
        """SELECT event_id,
          |  latest(nullif(event_type, 'view'), 'none') OVER (PARTITION BY user_id) AS lat,
          |  round(acc_sum(value) OVER (PARTITION BY user_id WHEN value > 50), 6) AS asum,
          |  acc_count(value) OVER (PARTITION BY user_id WHEN event_type = 'click') AS clicks,
          |  lag(nullif(event_type, 'view'), 1, 'start') OVER (PARTITION BY user_id) AS prev_nonview,
          |  changed_col(true, event_type) OVER (PARTITION BY user_id) AS chg
          |FROM events_asql""".stripMargin
      s.sql(graft.rules.AnalyticSql.rewrite(sql, "event_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_analytic_sql" ->
      """SELECT event_id,
        |  coalesce(last_value(nullif(event_type,'view') IGNORE NULLS) OVER wr, 'none') AS lat,
        |  round(coalesce(sum(CASE WHEN value > 50 THEN CAST(value AS DOUBLE) END) OVER wr, 0), 6) AS asum,
        |  count(CASE WHEN event_type = 'click' THEN value END) OVER wr AS clicks,
        |  lag(nullif(event_type,'view'), 1, 'start' IGNORE NULLS) OVER wo AS prev_nonview,
        |  CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER wo THEN event_type END AS chg
        |FROM events
        |WINDOW wr AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       wo AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin,
    "q_analytic" ->
      """SELECT event_id,
        |  lag(value) OVER w AS prev_val,
        |  last_value(nullif(event_type,'view') IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_nonview
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q_analytic_changed" ->
      """SELECT event_id,
        |  (prevT IS NULL OR prevT <> event_type) AS had_changed,
        |  CASE WHEN prevT IS NULL OR prevT <> event_type THEN event_type END AS changed_val,
        |  CAST(to_json(map_from_entries(list_filter([
        |      {key: 'event_type', value: CASE WHEN prevT IS NULL OR prevT <> event_type
        |         THEN event_type END},
        |      {key: 'value', value: CASE WHEN prevV IS NULL OR prevV <> value
        |         THEN CAST(value AS VARCHAR) END}
        |    ], x -> x.value IS NOT NULL))) AS VARCHAR) AS changed_cols
        |FROM (SELECT event_id, event_type, value,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prevT,
        |        lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prevV
        |      FROM events)""".stripMargin,
    "q_acc" ->
      """SELECT event_id,
        |  round(sum(value) OVER w, 2) AS acc_sum,
        |  count(*) OVER w AS acc_cnt,
        |  min(value) OVER w AS acc_min,
        |  max(value) OVER w AS acc_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_agg_collect" ->
      """SELECT user_id, CAST(to_json(list_sort(list(round(value,2)))) AS VARCHAR) AS vals,
        |  arg_min(value, event_id) AS first_val,
        |  arg_max(value, event_id) AS last_val,
        |  count(*) AS n
        |FROM events GROUP BY user_id""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(median(l_quantity),6) AS med,
        |  round(quantile_disc(l_quantity, 0.9),6) AS p90_disc,
        |  round(quantile_cont(l_quantity, 0.9),6) AS p90_cont,
        |  round(stddev_samp(l_quantity),6) AS sd_samp,
        |  round(stddev_pop(l_quantity),6) AS sd_pop,
        |  round(var_samp(l_quantity),6) AS v_samp,
        |  round(var_pop(l_quantity),6) AS v_pop
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_agg_obj" ->
      """WITH x AS (
        |  SELECT user_id, event_type, round(arg_max(value, event_id),2) AS v
        |  FROM events GROUP BY 1,2)
        |SELECT user_id, CAST(to_json(map_from_entries(
        |  list_sort(list(struct_pack(key := event_type, value := v))))) AS VARCHAR) AS merged
        |FROM x GROUP BY user_id""".stripMargin,
    "q_dedup_keyed" ->
      """SELECT user_id, event_type, min(event_id) AS first_eid,
        |  arg_min(value, event_id) AS first_val
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "q_analytic_hits" ->
      """SELECT event_id,
        |  CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) OVER w AS BIGINT) AS last_hit_count,
        |  coalesce(max(CASE WHEN value > 100 THEN epoch_us(ts) END) OVER w, -1) AS last_hit_time,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delayed_val
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_agg_hits" ->
      """WITH agg AS (
        |  SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws,
        |    round(sum(value),2) AS sum_val
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, ws,
        |  CAST(sum(CASE WHEN sum_val > 150 THEN 1 ELSE 0 END) OVER w AS BIGINT) AS last_agg_hit_count,
        |  coalesce(max(CASE WHEN sum_val > 150 THEN ws END) OVER w, -1) AS last_agg_hit_time
        |FROM agg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ws
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
