package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in join operators don't express directly:
  * point-in-time (as-of) join and bounded time-range join.
  *
  * Neither exists in the reference (its stream-stream join is an
  * equi-join within a time bound — rules/RuleEngine covers that);
  * these are the two shapes every feature-backfill / telemetry-
  * enrichment pipeline needs, so they're first-class here alongside
  * the §2.9 pipeline pack.
  *
  * Both are built to hold at 100 TB:
  *   - `asofJoin` is ONE hash-shuffle of `left ∪ right` by the join
  *     key, then a per-key sorted window carry-forward — no range
  *     explosion, no per-row subquery, state is one struct per row.
  *   - `rangeJoin` buckets the build side by a fixed time grain and
  *     fans the probe side out to the 2–3 buckets its interval can
  *     touch, turning an inequality join (a per-key cartesian in naive
  *     form) into an equi-join on (key, bucket) with a residual
  *     filter. Catalyst plans a shuffled equi-join, never a
  *     nested-loop.
  */
object Temporal {

  /** For each left row, attach the single most recent right row with
    * the same `key` and right time ≤ left time (a right row exactly at
    * the left row's time DOES match; ties among right rows at the same
    * instant resolve to the greatest `rightTie`). Rows with no match
    * carry nulls. `toleranceUs` (if set) voids matches older than
    * `lTime - toleranceUs`.
    *
    * `rightCols` are emitted under their own names (caller renames
    * upstream on collision); every left column is preserved.
    *
    * Implementation: tag both sides, union, and run one running
    * `last(_, ignoreNulls)` over
    * `Window.partitionBy(key).orderBy(time, side, tie)` — right rows
    * sort before left rows at an equal timestamp so "at-or-before"
    * includes the instant itself. One shuffle, by `key` alone; the
    * carried state is a single struct column.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      lTime: String,
      rTime: String,
      rightTie: String,
      rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.forall(c => !leftCols.contains(c)),
      "left/right column collision — rename before asofJoin")

    val rStructed = right
      .withColumn("_asof_t", unix_micros(col(rTime)))
      .withColumn("_asof_r", struct(
        (rightCols.map(col) :+ col("_asof_t").as("_asof_rt")): _*))
    val rStructType = rStructed.schema("_asof_r").dataType

    val lTagged = left
      .withColumn("_asof_t", unix_micros(col(lTime)))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_tie", lit(Long.MaxValue))
      .withColumn("_asof_r", lit(null).cast(rStructType))
      .select((Seq(col(key), col("_asof_t"), col("_asof_side"), col("_asof_tie"),
        col("_asof_r")) ++ leftCols.filterNot(_ == key).map(col)): _*)

    val rTagged = rStructed
      .withColumn("_asof_side", lit(0))
      .withColumn("_asof_tie", col(rightTie).cast("long"))
      .select((Seq(col(key), col("_asof_t"), col("_asof_side"), col("_asof_tie"),
        col("_asof_r")) ++ leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_asof_t"), col("_asof_side"), col("_asof_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumn("_asof_m", last(col("_asof_r"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)

    val tolerated = toleranceUs match {
      case Some(tol) => carried.withColumn("_asof_m",
        when(col("_asof_t") - col("_asof_m._asof_rt") <= tol, col("_asof_m")))
      case None => carried
    }

    tolerated.select(
      (leftCols.map(col) ++ rightCols.map(c => col(s"_asof_m.$c").as(c))): _*)
  }

  /** INNER equi-key time-range join: every (probe, build) pair with
    * the same `key` and `bTime ∈ [pTime+lowerUs, pTime+upperUs]`.
    * Output = all probe columns + `buildCols` + `_rj_matched_t` (the
    * matched build row's time in µs).
    *
    * Left/zero semantics belong to the caller: aggregate the matches
    * per probe id, then left-join the probe side to the aggregate —
    * that keeps this operator duplicate-free (the probe fan-out makes
    * an in-operator LEFT join emit one null row per unmatched bucket).
    *
    * The build side lands in exactly ONE bucket
    * (`grain = upperUs - lowerUs`), the probe side explodes to the
    * buckets its interval can touch (2–3), so no pair is produced
    * twice and fan-out is bounded by construction.
    */
  def rangeJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      pTime: String,
      bTime: String,
      lowerUs: Long,
      upperUs: Long,
      buildCols: Seq[String]): DataFrame = {
    require(upperUs > lowerUs, "empty range")
    val grain = upperUs - lowerUs
    val probeCols = probe.columns.toSeq
    require(buildCols.forall(c => !probeCols.contains(c)),
      "probe/build column collision — rename before rangeJoin")

    val b = build
      .withColumn("_rj_bt", unix_micros(col(bTime)))
      .withColumn("_rj_bucket", floor(col("_rj_bt") / grain))
      .select((Seq(col(key).as("_rj_key"), col("_rj_bucket"), col("_rj_bt")) ++
        buildCols.map(col)): _*)

    val p = probe
      .withColumn("_rj_pt", unix_micros(col(pTime)))
      .withColumn("_rj_bucket", explode(sequence(
        floor((col("_rj_pt") + lowerUs) / grain),
        floor((col("_rj_pt") + upperUs) / grain))))

    p.join(b,
        p("_rj_bucket") === b("_rj_bucket") && p(key) === b("_rj_key") &&
          b("_rj_bt").between(p("_rj_pt") + lowerUs, p("_rj_pt") + upperUs))
      .select((probeCols.map(p(_)) ++ buildCols.map(b(_)) :+
        b("_rj_bt").as("_rj_matched_t")): _*)
  }

  /** Interval-overlap join: all (left, right) pairs with the same
    * `key` whose half-open time intervals [start, end) overlap —
    * rangeJoin's two-sided sibling (point-in-range is the special
    * case of a zero-length left interval). Emits each pair's overlap
    * length alongside the selected columns.
    *
    * Scale design: both sides explode to the fixed-`grainUs` buckets
    * their interval covers and meet in an EQUI-join on (key, bucket)
    * — never a nested loop. A pair overlapping many shared buckets
    * is emitted exactly ONCE without any dedup shuffle: only the
    * bucket containing max(lStart, rStart) — a point both intervals
    * cover iff they overlap — reports the pair (the classic
    * interval-join ownership trick). Choose `grainUs` near the
    * typical interval length: cost per row = interval/grain bucket
    * replicas; the residual overlap predicate handles the boundaries.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   grainUs: Long,
                   leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    require(grainUs > 0, "grainUs must be positive")
    require(leftCols.intersect(rightCols).isEmpty,
      "left/right column collision — rename before intervalJoin")
    // the selected columns ride alongside the internal join columns,
    // so the _ij_ prefix, the re-emitted key, and the overlap_us
    // output are reserved names on both sides
    val sel = leftCols ++ rightCols
    val clash = sel.filter(c =>
      c.startsWith("_ij_") || c == key || c == "overlap_us")
    require(clash.isEmpty,
      s"intervalJoin reserves ${clash.mkString(", ")} — rename upstream")
    // empty intervals can match nothing and would flip sequence()
    // into descending order — drop them before the explode
    val l = left
      .withColumn("_ij_ls", unix_micros(col(lStart)))
      .withColumn("_ij_le", unix_micros(col(lEnd)))
      .where(col("_ij_le") > col("_ij_ls"))
      .withColumn("_ij_bucket", explode(sequence(
        floor(col("_ij_ls") / grainUs), floor((col("_ij_le") - 1) / grainUs))))
      .select((Seq(col(key).as("_ij_key"), col("_ij_bucket"),
        col("_ij_ls"), col("_ij_le")) ++ leftCols.map(col)): _*)
    val r = right
      .withColumn("_ij_rs", unix_micros(col(rStart)))
      .withColumn("_ij_re", unix_micros(col(rEnd)))
      .where(col("_ij_re") > col("_ij_rs"))
      .withColumn("_ij_bucket", explode(sequence(
        floor(col("_ij_rs") / grainUs), floor((col("_ij_re") - 1) / grainUs))))
      .select((Seq(col(key).as("_ij_rkey"), col("_ij_bucket").as("_ij_rbucket"),
        col("_ij_rs"), col("_ij_re")) ++ rightCols.map(col)): _*)
    l.join(r,
        col("_ij_key") === col("_ij_rkey") &&
          col("_ij_bucket") === col("_ij_rbucket") &&
          col("_ij_ls") < col("_ij_re") && col("_ij_rs") < col("_ij_le") &&
          col("_ij_bucket") ===
            floor(greatest(col("_ij_ls"), col("_ij_rs")) / grainUs))
      .select((Seq(col("_ij_key").as(key)) ++ leftCols.map(col) ++
        rightCols.map(col) :+
        (least(col("_ij_le"), col("_ij_re")) -
          greatest(col("_ij_ls"), col("_ij_rs"))).as("overlap_us")): _*)
  }

  /** Ordered-stage funnel (the product-analytics conversion query):
    * per user, anchor at the FIRST stage-1 event, then each later
    * stage matches its earliest event STRICTLY after the previous
    * stage's match and within `windowUs` of the anchor. Greedy
    * earliest-match is exact under a fixed anchor (taking the
    * earliest tₖ maximizes the time left for stage k+1); the
    * first-anchor convention is the one funnel dashboards use and is
    * stated here so the number has one meaning. Returns one row per
    * stage: (stage, event_type, n_users, conv_rate vs stage 1).
    *
    * Scale shape: stage k is ONE filtered scan of the events table
    * (predicate pushed to parquet) hash-joined on the user key
    * against the (shrinking) frontier of users still in the funnel,
    * then a partial-agg'd min — k stages, k scans, k user-key
    * shuffles of FILTERED slices; no per-user sort, no window over
    * the raw event stream, no state beyond one timestamp per reached
    * stage. The final per-stage counts fold to `stages.size` rows.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             windowUs: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size, "duplicate funnel stage")
    require(windowUs > 0, "windowUs must be positive")
    val ev = events.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("ts"), col(typeCol).as("et"))
    val s1 = ev.where(col("et") === stages.head)
      .groupBy(col("u")).agg(min(col("ts")).as("t1"))
    val frontiers = stages.tail.zipWithIndex.scanLeft(s1) {
      case (prev, (stage, i)) =>
        val k = i + 2
        val carried = (1 until k).map(j => col(s"t$j"))
        ev.where(col("et") === stage)
          .join(prev, Seq("u"))
          .where(col("ts") > col(s"t${k - 1}") &&
            col("ts") <= col("t1") + windowUs)
          .groupBy((col("u") +: carried): _*)
          .agg(min(col("ts")).as(s"t$k"))
    }
    val counts = frontiers.zip(stages).zipWithIndex.map {
      case ((f, stage), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage"), lit(stage).as("event_type"),
            col("n_users"))
    }.reduce(_ unionByName _)
    val base = frontiers.head.agg(count(lit(1)).as("n1"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("event_type"), col("n_users"),
        round(when(col("n1") > 0,
          col("n_users").cast("double") / col("n1")).otherwise(lit(0.0)), 6)
          .as("conv_rate"))
  }

  /** Deterministic rate limiting (message throttling): per key and
    * fixed time bucket, keep only the FIRST `maxPerBucket` events in
    * (ts, id) order — the downsampling rule an edge gateway applies
    * to a chatty device before fan-in. Pure function of the data (no
    * RNG, no wall clock), so replays and backfills keep identical
    * rows. Returns the surviving rows unchanged.
    *
    * Scale shape: ONE shuffle on (key, bucket) into a ranked window;
    * the bucket key keeps any single window partition at one key ×
    * one bucket of rows, so a hot key cannot funnel its whole history
    * into one task the way a key-only window would.
    */
  def throttle(events: DataFrame, keyCol: String, tsCol: String,
               idCol: String, bucketUs: Long, maxPerBucket: Int): DataFrame = {
    require(bucketUs > 0 && maxPerBucket >= 1)
    val w = Window.partitionBy(col(keyCol), col("_th_bucket"))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_th_bucket", floor(unix_micros(col(tsCol)) / bucketUs))
      .withColumn("_th_rn", row_number().over(w))
      .where(col("_th_rn") <= maxPerBucket)
      .drop("_th_rn", "_th_bucket")
  }

  /** Event-sequence pattern matching (MATCH_RECOGNIZE-lite CEP): per
    * user, the event-time-ordered event types encode to a character
    * string and a regex counts its non-overlapping matches — "view,
    * one-or-more clicks, purchase" is just `vc+p`. The regex engine
    * IS the pattern automaton, so alternation, bounded repetition,
    * and optional steps come free — the funnel's fixed stage chain is
    * the special case `v.*c.*p` within a window.
    *
    * Scale shape: one shuffle on the user key folding each user's
    * coded events into a string (array_sort of (ts, id, code)
    * structs — deterministic under same-µs ties), then a map-side
    * regex. Per-user state is the coded sequence — CEP over entities
    * with bounded history (sessions, devices, orders); for unbounded
    * per-key streams, window upstream or use the rules engine's
    * stateful operators. Returns (user, seq, n_matches).
    */
  def matchPattern(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   codes: Seq[(String, String)], pattern: String): DataFrame = {
    require(codes.nonEmpty && codes.forall(_._2.length == 1),
      "codes must map each event type to ONE character")
    val code = codes.tail
      .foldLeft(when(col(typeCol) === codes.head._1, codes.head._2)) {
        case (acc, (t, c)) => acc.when(col(typeCol) === t, c)
      }
    events
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("ts"),
        col(idCol).as("eid"), code.as("code"))
      .where(col("code").isNotNull)
      .groupBy(col("u"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("ts"), col("eid"), col("code")))),
        s => s.getField("code"))).as("seq"))
      .select(col("u").as(userCol), col("seq"),
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0)))
          .cast("long").as("n_matches"))
  }

  /** Cohort retention (the funnel's longitudinal sibling): users
    * cohorted by the time bucket of their FIRST `anchorType` event;
    * for each elapsed-time offset k < maxBuckets, the fraction of the
    * cohort with ANY event in [anchor + k·bucket, anchor + (k+1)·
    * bucket). Offset 0 is 1.0 by construction (the anchor event
    * itself) — the sanity row dashboards keep. Returns
    * (cohort, offset, n_active, retention); `cohort` is the absolute
    * bucket index (⌊anchor µs / bucketUs⌋ — stable across runs and
    * corpus growth, unlike a dense rank).
    *
    * Scale shape: one filtered scan folds the anchors (user-keyed
    * partial agg); the events scan joins them on the user key (the
    * one corpus-sized shuffle, already the events table's natural
    * partitioning) and partial-aggregates to distinct (user, cohort,
    * offset) then to ≤ cohorts×maxBuckets rows; cohort sizes
    * broadcast back. No per-user sort, no window.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, anchorType: String,
                bucketUs: Long, maxBuckets: Int): DataFrame = {
    require(bucketUs > 0 && maxBuckets >= 1)
    val ev = events.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("ts"), col(typeCol).as("et"))
    val anchors = ev.where(col("et") === anchorType)
      .groupBy(col("u")).agg(min(col("ts")).as("t0"))
    val sizes = anchors
      .groupBy(floor(col("t0") / bucketUs).as("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    val active = ev.join(anchors, Seq("u"))
      .where(col("ts") >= col("t0") &&
        col("ts") < col("t0") + bucketUs * maxBuckets)
      .select(col("u"), floor(col("t0") / bucketUs).as("cohort"),
        floor((col("ts") - col("t0")) / bucketUs).as("offset"))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }
}
