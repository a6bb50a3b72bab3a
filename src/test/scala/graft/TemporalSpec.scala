package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Temporal joins: as-of (point-in-time) and bounded range join —
  * result equivalence against a naive per-row reference computed on a
  * hand-built fixture, plus plan-shape pins (one key shuffle for
  * as-of; equi-join, never a nested-loop, for the range join).
  */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = {
    // (id, user, tSec, kind, value) — includes an exact-tie purchase
    // (u1 @ 100 with two purchases), a purchase after the last click,
    // and a user with clicks but no purchases.
    val rows = Seq(
      (1L, "u1", 100L, "purchase", 5.0),
      (2L, "u1", 100L, "purchase", 7.0),
      (3L, "u1", 100L, "click", 0.0),
      (4L, "u1", 90L, "click", 0.0),
      (5L, "u1", 200L, "click", 0.0),
      (6L, "u1", 300L, "purchase", 9.0),
      (7L, "u2", 50L, "click", 0.0),
      (8L, "u3", 10L, "purchase", 1.0),
      (9L, "u3", 100000L, "click", 0.0))
    rows.toDF("id", "user", "t", "kind", "value")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
  }

  test("asof join: at-or-before match, max-tie at equal ts, nulls when none") {
    val df = fixture
    val clicks = df.where($"kind" === "click").select($"id", $"user", $"ts")
    val purchases = df.where($"kind" === "purchase")
      .select($"id".as("p_id"), $"user", $"ts".as("p_ts"), $"value".as("p_val"))
    val out = Temporal.asofJoin(clicks, purchases,
        key = "user", lTime = "ts", rTime = "p_ts", rightTie = "p_id",
        rightCols = Seq("p_id", "p_val"))
      .select($"id", $"p_id", $"p_val")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out === Set(
      (3L, 2L, 7.0),   // equal-ts tie → greatest p_id wins
      (4L, -1L, -1.0), // before any purchase
      (5L, 2L, 7.0),   // purchase @300 is later, still the @100 pair
      (7L, -1L, -1.0), // u2 has no purchases
      (9L, 8L, 1.0)))  // long gap still matches without tolerance
  }

  test("asof join: tolerance voids stale matches") {
    val df = fixture
    val clicks = df.where($"kind" === "click").select($"id", $"user", $"ts")
    val purchases = df.where($"kind" === "purchase")
      .select($"id".as("p_id"), $"user", $"ts".as("p_ts"))
    val out = Temporal.asofJoin(clicks, purchases,
        key = "user", lTime = "ts", rTime = "p_ts", rightTie = "p_id",
        rightCols = Seq("p_id"), toleranceUs = Some(150L * 1000000))
      .select($"id", $"p_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // click 9 (u3 @100000s) is ~99990s after purchase 8 → voided
    assert(out.contains((9L, -1L)) && out.contains((3L, 2L)) && out.contains((5L, 2L)))
  }

  test("asof join plan: exactly one shuffle, by the key alone") {
    val df = fixture
    val clicks = df.where($"kind" === "click").select($"id", $"user", $"ts")
    val purchases = df.where($"kind" === "purchase")
      .select($"id".as("p_id"), $"user", $"ts".as("p_ts"))
    val out = Temporal.asofJoin(clicks, purchases,
      key = "user", lTime = "ts", rTime = "p_ts", rightTie = "p_id",
      rightCols = Seq("p_id"))
    val p = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).toSeq
    assert(shuffles.size === 1, s"want 1 shuffle, got ${shuffles.size}:\n${p.take(2000)}")
    val keyed = "Exchange hashpartitioning\\(user".r.findAllIn(p).size
    assert(keyed === 1, s"shuffle not keyed by user alone:\n${p.take(2000)}")
  }

  test("range join: exact pair set on a fixture with bucket-boundary pairs") {
    val df = fixture
    val errors = df.where($"kind" === "click").select($"id", $"user", $"ts")
    val near = df.where($"kind" === "purchase")
      .select($"user", $"ts".as("b_ts"), $"id".as("b_id"))
    // ±60 s window; naive reference via a plain (small) cross filter
    val got = Temporal.rangeJoin(errors, near,
        key = "user", pTime = "ts", bTime = "b_ts",
        lowerUs = -60L * 1000000, upperUs = 60L * 1000000,
        buildCols = Seq("b_id"))
      .select($"id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      e <- Seq((3L, "u1", 100L), (4L, "u1", 90L), (5L, "u1", 200L),
        (7L, "u2", 50L), (9L, "u3", 100000L))
      b <- Seq((1L, "u1", 100L), (2L, "u1", 100L), (6L, "u1", 300L), (8L, "u3", 10L))
      if e._2 == b._2 && math.abs(e._3 - b._3) <= 60
    } yield (e._1, b._1)).toSet
    assert(got === want)
    assert(want.contains((4L, 1L)) && !want.contains((5L, 6L)))
  }

  test("range join plan: equi-join, no nested-loop or cartesian") {
    val df = fixture
    val errors = df.where($"kind" === "click").select($"id", $"user", $"ts")
    val near = df.where($"kind" === "purchase")
      .select($"user", $"ts".as("b_ts"), $"id".as("b_id"))
    val plan = Temporal.rangeJoin(errors, near,
      key = "user", pTime = "ts", bTime = "b_ts",
      lowerUs = -60L * 1000000, upperUs = 60L * 1000000,
      buildCols = Seq("b_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("range join: every build row in exactly one bucket (no duplicate pairs)") {
    val df = fixture
    val probe = df.select($"id", $"user", $"ts")
    val build = df.select($"user", $"ts".as("b_ts"), $"id".as("b_id"))
    val out = Temporal.rangeJoin(probe, build,
        key = "user", pTime = "ts", bTime = "b_ts",
        lowerUs = -90L * 1000000, upperUs = 90L * 1000000,
        buildCols = Seq("b_id"))
      .groupBy($"id", $"b_id").count().where($"count" > 1).count()
    assert(out === 0L)
  }

  test("funnel: first-anchor greedy semantics, window cutoff, strict order") {
    import graft.operators.Temporal
    // u1: A@10 B@20 C@30            → full funnel
    // u2: A@10 C@20 B@30            → C precedes B: depth 2 only
    // u3: A@10 B@200                → B outside the 100 s window
    // u4: B@5 C@6                   → no anchor, not in the funnel
    // u5: A@10 B@10                 → B not STRICTLY after A
    // u6: A@50 A@10 B@105           → anchor = FIRST A (10); 105 ≤ 110 ok
    val rows = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      (2L, 10L, "A"), (2L, 20L, "C"), (2L, 30L, "B"),
      (3L, 10L, "A"), (3L, 200L, "B"),
      (4L, 5L, "B"), (4L, 6L, "C"),
      (5L, 10L, "A"), (5L, 10L, "B"),
      (6L, 50L, "A"), (6L, 10L, "A"), (6L, 105L, "B")
    ).map { case (u, t, e) => (u, new java.sql.Timestamp(t * 1000L), e) }
      .toDF("user_id", "ts", "event_type")
    val out = Temporal.funnel(rows, "user_id", "ts", "event_type",
      Seq("A", "B", "C"), windowUs = 100L * 1000000).orderBy("stage").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "A", 5L), (2, "B", 3L), (3, "C", 1L)), out.mkString(","))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.6, 0.2))
  }

  test("throttle: first N per (key, bucket) in (ts, id) order; buckets reset the count") {
    import graft.operators.Temporal
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // bucket = 10 s, max 2. key 1: 4 events in bucket 0 (two tie at
    // t=1 — ids 3,4; id breaks the tie), 1 event in bucket 1.
    val rows = Seq(
      (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 2L), (1L, 6L, 3L),
      (1L, 7L, 12L),
      (2L, 8L, 5L))
      .map { case (k, id, t) => (k, id, ts(t)) }
      .toDF("k", "id", "ts")
    val kept = Temporal.throttle(rows, "k", "ts", "id",
        bucketUs = 10L * 1000000, maxPerBucket = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 7L, 8L), kept.toString)
  }

  test("matchPattern: regex counts ordered runs; ties break by id; unmapped types drop") {
    import graft.operators.Temporal
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq(
      // u1: v c c p → one vc+p run
      (1L, 1L, 10L, "view"), (1L, 2L, 11L, "click"),
      (1L, 3L, 12L, "click"), (1L, 4L, 13L, "purchase"),
      // u2: v p → no run (needs ≥1 click)
      (2L, 5L, 10L, "view"), (2L, 6L, 11L, "purchase"),
      // u3: two non-overlapping runs; an unmapped type in between drops
      (3L, 7L, 10L, "view"), (3L, 8L, 11L, "click"), (3L, 9L, 12L, "purchase"),
      (3L, 10L, 13L, "signup"),
      (3L, 11L, 14L, "view"), (3L, 12L, 15L, "click"), (3L, 13L, 16L, "purchase"),
      // u4: same-second events order by event_id: v(20) c(21) p(22)
      (4L, 21L, 30L, "click"), (4L, 20L, 30L, "view"), (4L, 22L, 30L, "purchase")
    ).map { case (u, id, t, e) => (u, id, ts(t), e) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Temporal.matchPattern(rows, "user_id", "ts", "event_id",
        "event_type",
        codes = Seq("view" -> "v", "click" -> "c", "purchase" -> "p"),
        pattern = "vc+p")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> ("vccp", 1L), 2L -> ("vp", 0L),
      3L -> ("vcpvcp", 2L), 4L -> ("vcp", 1L)), out.toString)
  }

  test("columnStats: interpolated equi-depth bounds, exact ndv, nulls uncounted") {
    import graft.operators.Stats
    import spark.implicits._
    // values 1..8: q(p) = 1 + 7p → cuts 1, 2.75, 4.5, 6.25, 8
    val df = ((1 to 8).map(i => Option(i.toDouble)) :+ (None: Option[Double]))
      .toDF("v")
    val rows = Stats.columnStats(df, "v", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0, 1.0, 2.75, 8L, 8L), (1, 2.75, 4.5, 8L, 8L),
      (2, 4.5, 6.25, 8L, 8L), (3, 6.25, 8.0, 8L, 8L)), rows.mkString(","))
  }

  test("robustOutliers: MAD flags the wild value, tolerates 40% junk, mad=0 convention") {
    import graft.operators.Stats
    import spark.implicits._
    val df = (
      // a: 1..9 (med 5.5 with the outlier, mad 2.5) + wild 100 → only 100 flags
      (1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 100.0)
    ) ++ Seq(
      // b: majority-constant, one off value → mad = 0 convention flags it
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 7.0),
      // c: all identical → nothing flags
      ("c", 2.0), ("c", 2.0))
    val out = Stats.robustOutliers(df.toDF("g", "v"), "g", "v", k = 3.5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("a", 100.0), ("b", 7.0)), out.toString)
  }

  test("interval join: exact pairs, one emission across shared buckets, half-open edges") {
    import graft.operators.Temporal
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // grain 10 s. L1 [0,25) x R1 [5,35): 3 shared buckets, ONE row.
    // L2 [40,50) x R2 [50,60): touching, half-open -> NO match.
    // L3 [100,200) contains R3 [150,160): one row, overlap 10 s.
    // key 9 vs key 8: never match.
    val left = Seq(
      (1L, 10L, 0L, 25L), (1L, 11L, 40L, 50L),
      (2L, 12L, 100L, 200L), (9L, 13L, 0L, 100L)
    ).map { case (k, id, s, e) => (k, id, ts(s), ts(e)) }
      .toDF("k", "l_id", "l_s", "l_e")
    val right = Seq(
      (1L, 20L, 5L, 35L), (1L, 21L, 50L, 60L),
      (2L, 22L, 150L, 160L), (8L, 23L, 0L, 100L)
    ).map { case (k, id, s, e) => (k, id, ts(s), ts(e)) }
      .toDF("k", "r_id", "r_s", "r_e")
    val out = Temporal.intervalJoin(left, right, key = "k",
        lStart = "l_s", lEnd = "l_e", rStart = "r_s", rEnd = "r_e",
        grainUs = 10L * 1000000,
        leftCols = Seq("l_id"), rightCols = Seq("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set(
      (1L, 10L, 20L, 20L * 1000000),
      (2L, 12L, 22L, 10L * 1000000)), out.mkString(","))
    assert(out.length == 2, "each overlapping pair must be emitted exactly once")
  }

  test("interval join rejects selected columns colliding with reserved names") {
    import graft.operators.Temporal
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq((1L, 10L, ts(0), ts(5))).toDF("k", "_ij_x", "l_s", "l_e")
    val right = Seq((1L, 20L, ts(0), ts(5))).toDF("k", "r_id", "r_s", "r_e")
    def run(lc: Seq[String], rc: Seq[String]) =
      Temporal.intervalJoin(left, right, key = "k",
        lStart = "l_s", lEnd = "l_e", rStart = "r_s", rEnd = "r_e",
        grainUs = 1000000L, leftCols = lc, rightCols = rc)
    // an _ij_-prefixed selection shadows the internal join columns
    val e = intercept[IllegalArgumentException](run(Seq("_ij_x"), Seq("r_id")))
    assert(e.getMessage.contains("_ij_x"))
    // re-selecting the key or claiming the overlap_us output collides
    intercept[IllegalArgumentException](run(Seq.empty, Seq("k")))
    val right2 = right.withColumnRenamed("r_id", "overlap_us")
    intercept[IllegalArgumentException](
      Temporal.intervalJoin(left, right2, key = "k",
        lStart = "l_s", lEnd = "l_e", rStart = "r_s", rEnd = "r_e",
        grainUs = 1000000L, leftCols = Seq.empty, rightCols = Seq("overlap_us")))
  }

  test("retention: cohorted by first anchor, offset buckets, pre-anchor and beyond-horizon excluded") {
    import graft.operators.Temporal
    // bucket = 10 s, maxBuckets = 3
    // u1: signup@5  (cohort 0), activity at 12 (offset 0), 27 (offset 2),
    //     40 (offset 3 — beyond the horizon, dropped)
    // u2: signup@15 (cohort 1), activity at 24 (offset 0), 26 (offset 1)
    // u3: signup@8  (cohort 0), a PRE-anchor view@2 (dropped) and nothing after
    // u4: no signup — not cohorted at all
    val rows = Seq(
      (1L, 5L, "signup"), (1L, 12L, "view"), (1L, 27L, "view"), (1L, 40L, "view"),
      (2L, 15L, "signup"), (2L, 24L, "view"), (2L, 26L, "view"),
      (3L, 8L, "signup"), (3L, 2L, "view"),
      (4L, 3L, "view")
    ).map { case (u, t, e) => (u, new java.sql.Timestamp(t * 1000L), e) }
      .toDF("user_id", "ts", "event_type")
    val out = Temporal.retention(rows, "user_id", "ts", "event_type",
        "signup", bucketUs = 10L * 1000000, maxBuckets = 3)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 1.0),   // anchors themselves: offset 0 is full
      (0L, 2L, 1L, 0.5),   // only u1 came back in week 2
      (1L, 0L, 1L, 1.0),
      (1L, 1L, 1L, 1.0)), out.mkString(","))
  }

  test("funnel: empty stage-1 cohort yields zero rates, not a division error") {
    import graft.operators.Temporal
    val rows = Seq((1L, 10L, "B"))
      .map { case (u, t, e) => (u, new java.sql.Timestamp(t * 1000L), e) }
      .toDF("user_id", "ts", "event_type")
    val out = Temporal.funnel(rows, "user_id", "ts", "event_type",
      Seq("A", "B"), windowUs = 1000000L).orderBy("stage").collect()
    assert(out.map(r => (r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((0L, 0.0), (0L, 0.0)))
  }
}
