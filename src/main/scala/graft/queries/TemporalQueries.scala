package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Temporal

/** SURVEY §2.9 — temporal join operators (as-of / point-in-time join,
  * bounded range join) over the events table, each with a full DuckDB
  * oracle. The oracle SQL mirrors the operator's semantics in portable
  * window/inequality-join form (not DuckDB's ASOF JOIN extension, whose
  * tie-breaking at equal timestamps is unspecified).
  */
object TemporalQueries {

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // point-in-time: each click attached to the user's most recent
    // purchase at-or-before the click (tie at the same µs → greatest
    // purchase event_id). -1 sentinels keep the columns non-nullable
    // for the driver's hasher.
    "q_join_asof" -> ((s, d) => {
      val e = ev(s, d)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_eid"), col("user_id"),
          col("ts").as("p_ts"), round(col("value"), 2).as("p_val"))
      Temporal.asofJoin(clicks, purchases,
          key = "user_id", lTime = "ts", rTime = "p_ts", rightTie = "p_eid",
          rightCols = Seq("p_eid", "p_val"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("p_eid"), lit(-1L)).as("p_eid"),
          coalesce(col("p_val"), lit(-1.0)).as("p_val"))
    }),

    // as above but only matches within the last 6 hours — the
    // tolerance variant (feature freshness window).
    "q_join_asof_tol" -> ((s, d) => {
      val e = ev(s, d)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_eid"), col("user_id"), col("ts").as("p_ts"))
      Temporal.asofJoin(clicks, purchases,
          key = "user_id", lTime = "ts", rTime = "p_ts", rightTie = "p_eid",
          rightCols = Seq("p_eid"), toleranceUs = Some(6L * 3600 * 1000000))
        .select(col("event_id"),
          coalesce(col("p_eid"), lit(-1L)).as("p_eid"))
    }),

    // bounded range join: per error event, how many clicks the same
    // user made within ±2 h, and their value sum. Zero-match errors
    // stay (probe left-joins the aggregated matches). ±2 h (not ±30 s)
    // so the match set is non-trivial at every SF.
    "q_join_range" -> ((s, d) => {
      val e = ev(s, d)
      val errors = e.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_val"))
      val matches = Temporal.rangeJoin(errors, clicks,
          key = "user_id", pTime = "ts", bTime = "c_ts",
          lowerUs = -7200L * 1000000, upperUs = 7200L * 1000000,
          buildCols = Seq("c_val"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_nearby"), round(sum(col("c_val")), 2).as("sum_nearby"))
      errors.select(col("event_id"))
        .join(matches, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
          coalesce(col("sum_nearby"), lit(0.0)).as("sum_nearby"))
    }),

    // ordered-stage conversion funnel view → click → purchase within
    // 7 days of the user's FIRST view: per stage, how many users got
    // there and the conversion rate vs stage 1. Stage k = one
    // pushdown-filtered scan joined on user against the shrinking
    // frontier — no per-user sort, no event-stream window. FULL
    // oracle (greedy earliest-match over epoch-µs longs).
    "q_funnel" -> ((s, d) =>
      Temporal.funnel(ev(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowUs = 7L * 86400 * 1000000)),

    // interval-overlap join: per user, error episodes [ts, ts+2h)
    // overlapping purchase sessions [ts, ts+2h) — incident-impact
    // attribution. Equi-join on (user, 2h bucket) with the max-start
    // ownership emit (each pair exactly once, no dedup shuffle).
    // FULL oracle (plain inequality join replays it).
    "q_join_interval" -> ((s, d) => {
      val e = ev(s, d)
      val twoH = expr("INTERVAL 2 HOURS")
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("l_eid"),
          col("ts").as("l_s"), (col("ts") + twoH).as("l_e"))
      val buys = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("r_eid"),
          col("ts").as("r_s"), (col("ts") + twoH).as("r_e"))
      Temporal.intervalJoin(errors, buys, key = "user_id",
        lStart = "l_s", lEnd = "l_e", rStart = "r_s", rEnd = "r_e",
        grainUs = 7200L * 1000000,
        leftCols = Seq("l_eid"), rightCols = Seq("r_eid"))
    }),

    // deterministic throttle: at most 3 events per user per day, the
    // first three in (ts, id) order — replay-stable rate limiting.
    // One (key, bucket) shuffle. FULL oracle.
    "q_throttle" -> ((s, d) =>
      Temporal.throttle(ev(s, d), "user_id", "ts", "event_id",
          bucketUs = 86400L * 1000000, maxPerBucket = 3)
        .select(col("event_id"), col("user_id"), col("event_type"))),

    // CDC compaction: the events stream read as a change log (error =
    // delete, anything else = upsert); last (ts, event_id) per user
    // wins, deleted users drop. One partial-agg'd max_by shuffle.
    // FULL oracle.
    "q_cdc_compact" -> ((s, d) => {
      val log = ev(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("tsu"), col("event_id"),
        when(col("event_type") === "error", "delete")
          .otherwise("upsert").as("op"),
        round(col("value"), 2).as("v"))
      graft.operators.Layout.compactLog(log, "user_id", "tsu", "event_id",
        "op", "delete")
    }),

    // CEP pattern match: per user, count non-overlapping
    // "view, one-or-more clicks, then purchase" runs in the
    // event-time-ordered type sequence. FULL oracle (string_agg with
    // ORDER BY replays the deterministic encoding; `vc+p` means the
    // same thing to Java regex and RE2).
    "q_match_pattern" -> ((s, d) =>
      Temporal.matchPattern(ev(s, d), "user_id", "ts", "event_id",
        "event_type",
        codes = Seq("view" -> "v", "click" -> "c",
          "purchase" -> "p", "error" -> "e"),
        pattern = "vc+p")),

    // planner column statistics: 8-bucket equi-depth histogram + NDV
    // over the event values — the numbers a cost-based optimizer
    // reads to price a range filter (joinSizeEstimate prices the
    // join). One aggregation. FULL oracle (percentile ==
    // quantile_cont, exact distinct).
    "q_stats_column" -> ((s, d) =>
      graft.operators.Stats.columnStats(
        ev(s, d).select(round(col("value"), 2).as("v")), "v", buckets = 8)),

    // robust outlier detection: per event type, values whose robust
    // z-score |x - med| / (1.4826 MAD) exceeds 3.5 — the monitoring
    // alert rule with a 50% breakdown point. Two exact-percentile
    // aggs + broadcast joins; FULL oracle (percentile ==
    // quantile_cont). value rounds to 2dp upstream so the engines
    // agree at the median interpolation.
    "q_anomaly_mad" -> ((s, d) => {
      val e = ev(s, d).select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("v"))
      graft.operators.Stats.robustOutliers(e, "event_type", "v", k = 3.5)
        .select(col("event_type"), col("event_id"), col("v"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
          col("score"))
    }),

    // cohort retention: users cohorted by the week of their first
    // signup; per elapsed week 0-3, the fraction of the cohort with
    // any event that week. One user-keyed shuffle join + bounded
    // aggregates; cohort sizes broadcast. FULL oracle.
    "q_retention" -> ((s, d) =>
      Temporal.retention(ev(s, d), "user_id", "ts", "event_type",
        anchorType = "signup", bucketUs = 7L * 86400 * 1000000,
        maxBuckets = 4)),

    // key-skew audit of the events table's user key: top-20 heavy
    // hitters with their share and the salt factor that caps a task
    // at 50 rows of one key — the measurement a pipeline takes before
    // committing a shuffle to an unmeasured key. One partial-agg'd
    // shuffle + TakeOrdered. FULL oracle (exact counts, ceil-div).
    "q_skew_audit" -> ((s, d) =>
      graft.operators.Skew.audit(ev(s, d), "user_id", topN = 20,
        targetRowsPerTask = 50L)),

    // skew-mitigated join: lineitem ⋈ orders on the order key with
    // the 3 heaviest keys (from the audit) fanned out over 4 salts.
    // The oracle is the PLAIN join — salting must not change a single
    // row, only the task balance; DedupSpec-style plan evidence lives
    // in SkewSpec. Composition on purpose: audit → hot list →
    // saltedJoin is exactly the production loop.
    "q_skew_join" -> ((s, d) => {
      val left = Tables(s, d, "lineitem").select(
        col("l_orderkey").as("okey"), col("l_partkey"),
        round(col("l_quantity"), 2).as("qty"))
      val right = Tables(s, d, "orders").select(
        col("o_orderkey").as("okey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("total"))
      val hot = graft.operators.Skew.audit(left, "okey", topN = 3,
          targetRowsPerTask = 2L)
        .select(col("okey")).collect().map(_.getLong(0)).toSeq
      graft.operators.Skew.saltedJoin(left, right, key = "okey",
        hotKeys = hot, salt = 4, scatterCol = "l_partkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_asof" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS side
        |  FROM events WHERE event_type IN ('click','purchase')),
        |c AS (
        |  SELECT user_id, ts, event_id, side,
        |    last_value(CASE WHEN side=0 THEN event_id END IGNORE NULLS) OVER w AS p_eid,
        |    last_value(CASE WHEN side=0 THEN round(value,2) END IGNORE NULLS) OVER w AS p_val
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, coalesce(p_eid, -1) AS p_eid,
        |  coalesce(p_val, -1.0) AS p_val
        |FROM c WHERE side = 1""".stripMargin,
    "q_join_asof_tol" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS side
        |  FROM events WHERE event_type IN ('click','purchase')),
        |c AS (
        |  SELECT ts, event_id, side,
        |    last_value(CASE WHEN side=0 THEN event_id END IGNORE NULLS) OVER w AS p_eid,
        |    last_value(CASE WHEN side=0 THEN ts END IGNORE NULLS) OVER w AS p_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id,
        |  CASE WHEN p_ts IS NOT NULL
        |         AND epoch_us(ts) - epoch_us(p_ts) <= 6*3600*1000000::BIGINT
        |       THEN p_eid ELSE -1 END AS p_eid
        |FROM c WHERE side = 1""".stripMargin,
    "q_join_range" ->
      """SELECT e.event_id,
        |  count(c.user_id) AS n_nearby,
        |  coalesce(round(sum(c.value), 2), 0.0) AS sum_nearby
        |FROM events e LEFT JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        |  AND c.ts BETWEEN e.ts - INTERVAL 2 HOUR
        |              AND e.ts + INTERVAL 2 HOUR
        |WHERE e.event_type = 'error'
        |GROUP BY 1""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS ts, event_type AS et
        |  FROM events),
        |s1 AS (SELECT u, min(ts) AS t1 FROM e WHERE et = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, s1.t1, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.u = s1.u
        |  WHERE e.et = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + 604800000000
        |  GROUP BY e.u, s1.t1),
        |s3 AS (SELECT e.u, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.u = s2.u
        |  WHERE e.et = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t1 + 604800000000
        |  GROUP BY e.u, s2.t1, s2.t2),
        |n AS (
        |  SELECT 1 AS stage, 'view' AS event_type,
        |    CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |  UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT))
        |SELECT stage, event_type, n_users,
        |  round(CASE WHEN (SELECT count(*) FROM s1) > 0
        |    THEN n_users / CAST((SELECT count(*) FROM s1) AS DOUBLE)
        |    ELSE 0.0 END, 6) AS conv_rate
        |FROM n""".stripMargin,
    "q_join_interval" ->
      """WITH er AS (SELECT user_id, event_id AS l_eid, epoch_us(ts) AS ls,
        |    epoch_us(ts) + 7200000000 AS le
        |  FROM events WHERE event_type = 'error'),
        |pu AS (SELECT user_id, event_id AS r_eid, epoch_us(ts) AS rs,
        |    epoch_us(ts) + 7200000000 AS re
        |  FROM events WHERE event_type = 'purchase')
        |SELECT er.user_id, l_eid, r_eid,
        |  least(le, re) - greatest(ls, rs) AS overlap_us
        |FROM er JOIN pu ON pu.user_id = er.user_id
        |  AND er.ls < pu.re AND pu.rs < er.le""".stripMargin,
    "q_throttle" ->
      """WITH r AS (SELECT event_id, user_id, event_type,
        |    row_number() OVER (
        |      PARTITION BY user_id, CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_id, user_id, event_type FROM r WHERE rn <= 3""".stripMargin,
    "q_cdc_compact" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
        |    CASE WHEN event_type = 'error' THEN 'delete'
        |         ELSE 'upsert' END AS op,
        |    round(value, 2) AS v
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY tsu DESC, event_id DESC) AS rn FROM l)
        |SELECT user_id, tsu, event_id, op, v
        |FROM r WHERE rn = 1 AND op <> 'delete'""".stripMargin,
    "q_match_pattern" ->
      """WITH c AS (SELECT user_id, ts, event_id,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e' END AS code
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase', 'error')),
        |s AS (SELECT user_id,
        |    string_agg(code, '' ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM c GROUP BY user_id)
        |SELECT user_id, seq,
        |  CAST(len(regexp_extract_all(seq, 'vc+p')) AS BIGINT) AS n_matches
        |FROM s""".stripMargin,
    "q_stats_column" -> {
      val fr = (0 to 8).map(i => (i.toDouble / 8).toString).mkString(", ")
      s"""WITH t AS (SELECT round(value, 2) AS v FROM events),
         |s AS (SELECT quantile_cont(v, [$fr]) AS cuts,
         |    CAST(count(v) AS BIGINT) AS n_rows,
         |    CAST(count(DISTINCT v) AS BIGINT) AS ndv
         |  FROM t),
         |r AS (SELECT CAST(range AS INT) AS bucket FROM range(0, 8))
         |SELECT bucket, round(cuts[bucket + 1], 6) AS lo,
         |  round(cuts[bucket + 2], 6) AS hi, n_rows, ndv
         |FROM s CROSS JOIN r""".stripMargin
    },
    "q_anomaly_mad" ->
      """WITH e AS (SELECT event_id, event_type, round(value, 2) AS v
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(v, 0.5) AS med
        |  FROM e GROUP BY 1),
        |d AS (SELECT e.event_type, abs(e.v - m.med) AS ad
        |  FROM e JOIN m ON m.event_type = e.event_type),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM d GROUP BY 1),
        |s AS (SELECT e.event_type, e.event_id, e.v, m.med, md.mad,
        |    CASE WHEN md.mad > 0
        |      THEN round((e.v - m.med) / (1.4826 * md.mad), 6) END AS score
        |  FROM e JOIN m ON m.event_type = e.event_type
        |         JOIN md ON md.event_type = e.event_type)
        |SELECT event_type, event_id, v,
        |  round(med, 6) AS med, round(mad, 6) AS mad, score
        |FROM s
        |WHERE (mad > 0 AND abs(score) > 3.5) OR (mad = 0 AND v <> med)""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS ts, event_type AS et
        |  FROM events),
        |a AS (SELECT u, min(ts) AS t0 FROM e WHERE et = 'signup' GROUP BY u),
        |sz AS (SELECT CAST(floor(t0 / 604800000000) AS BIGINT) AS cohort,
        |    count(*) AS n_cohort
        |  FROM a GROUP BY 1),
        |act AS (SELECT DISTINCT e.u,
        |    CAST(floor(a.t0 / 604800000000) AS BIGINT) AS cohort,
        |    CAST(floor((e.ts - a.t0) / 604800000000) AS BIGINT) AS "offset"
        |  FROM e JOIN a ON e.u = a.u
        |  WHERE e.ts >= a.t0 AND e.ts < a.t0 + 604800000000 * 4),
        |n AS (SELECT cohort, "offset", CAST(count(*) AS BIGINT) AS n_active
        |  FROM act GROUP BY 1, 2)
        |SELECT n.cohort, n."offset", n.n_active,
        |  round(n.n_active / CAST(sz.n_cohort AS DOUBLE), 6) AS retention
        |FROM n JOIN sz ON sz.cohort = n.cohort""".stripMargin,
    "q_skew_audit" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM events GROUP BY user_id),
        |t AS (SELECT count(*) AS n_total FROM events)
        |SELECT user_id, n_rows,
        |  round(n_rows / CAST(n_total AS DOUBLE), 6) AS share,
        |  CAST(floor((n_rows + 49) / 50) AS BIGINT) AS salt
        |FROM c CROSS JOIN t
        |ORDER BY n_rows DESC, user_id LIMIT 20""".stripMargin,
    "q_skew_join" ->
      """SELECT l.l_orderkey AS okey, l.l_partkey,
        |  round(l.l_quantity, 2) AS qty,
        |  o.o_orderstatus, round(o.o_totalprice, 2) AS total
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin
  )
}
