package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew diagnostics and mitigation — the pair of operators a
  * pipeline runs BEFORE committing a 100 TB shuffle to a key whose
  * distribution it has never measured. `audit` finds the heavy
  * hitters and prices the fix; `saltedJoin` applies it without
  * changing the join's result. (Reference sibling: the planner
  * statistics family — [[Stats.columnStats]] prices a filter,
  * [[Cms.joinSizeEstimate]] prices a join's OUTPUT, this prices a
  * join's worst TASK.)
  */
object Skew {

  /** Heavy-hitter audit of a prospective shuffle/join key: the topN
    * keys by row count with their share of the table and the salt
    * factor that would bound any single task at `targetRowsPerTask`
    * rows of that key (salt = ⌈n / target⌉, 1 = no salting needed).
    * Returns (key, n_rows, share, salt) ordered by n_rows desc, key.
    *
    * Scale shape: ONE partial-agg'd shuffle folding the corpus to a
    * row per distinct key (localCheckpoint'd — the table feeds both
    * the topN and the grand total, and exchange reuse does not dedupe
    * twin agg subtrees), then TakeOrdered keeps the driver at topN
    * rows; the total folds from the count table and broadcasts back.
    * The output is the driver-sized hot-key list [[saltedJoin]] (and
    * an AQE-skew sanity check) consumes.
    */
  def audit(df: DataFrame, keyCol: String, topN: Int = 20,
            targetRowsPerTask: Long = 5000000L): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(targetRowsPerTask >= 1, "targetRowsPerTask must be >= 1")
    require(!Seq("n_rows", "n_total", "share", "salt").contains(keyCol),
      s"audit reserves $keyCol — rename upstream")
    // the keys-bounded count table feeds two branches (the topN and
    // the grand total) — materialize it once so the corpus is scanned
    // exactly ONCE (the prCurve pattern; exchange reuse does NOT
    // dedupe the two agg subtrees here, measured on the final plan)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(true)
    val total = counts.agg(coalesce(sum(col("n_rows")), lit(0L)).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total"), 6).as("share"),
        // ceil-div rendered as floor((n+t-1)/t) — Column `/` is DOUBLE
        // division, so this is exact only while n_rows+t-1 ≤ 2^53
        // (far beyond any real key count; the DuckDB oracle replays
        // the identical float form, so both engines agree bit-for-bit)
        floor((col("n_rows") + targetRowsPerTask - 1L) / targetRowsPerTask)
          .cast("long").as("salt"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topN)
  }

  /** Skew-mitigated inner equi-join: IDENTICAL output to
    * `left.join(right, Seq(key))`, but rows of the `hotKeys` fan out
    * over `salt` sub-keys so no single task owns a hot key's whole
    * row set. Left hot rows scatter deterministically by
    * xxhash64(`scatterCol`) mod salt; right hot rows replicate once
    * per salt value; everything else keeps salt 0 — the join runs on
    * (key, salt) and the helper column never escapes. Replication is
    * exact for any scatter assignment (each left row meets each
    * matching right row exactly once, in exactly one salt bucket), so
    * correctness needs no tuning — only the BALANCE depends on the
    * scatter hash.
    *
    * This is the manual form of AQE's skew-join split, for the cases
    * AQE cannot reach: a skewed key known BEFORE runtime (from
    * [[audit]] on yesterday's snapshot), a sort-merge join whose skew
    * sits in the build side of a later stage, or a deterministic plan
    * that must not depend on runtime re-planning. hotKeys is
    * driver-sized by construction (the audit's topN) and compiles to
    * a codegen'd isin(); salt multiplies ONLY the hot slice of the
    * right side, so the blow-up is |right ∩ hot| · (salt − 1) rows —
    * at 100 TB that is the dimension rows of a handful of keys, not
    * the fact table.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 hotKeys: Seq[Any], salt: Int,
                 scatterCol: String): DataFrame = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(hotKeys.nonEmpty, "empty hotKeys — use a plain join")
    require(left.columns.contains(scatterCol),
      s"scatterCol $scatterCol not in left")
    // scatterCol must VARY WITHIN a hot key: xxhash64 of a per-key
    // constant sends every row of the key to one salt bucket — the
    // mitigation silently does nothing while still paying the right-
    // side replication. scatterCol == key is that degenerate case
    // spelled out, so it fails loudly here.
    require(scatterCol != key,
      s"scatterCol must vary within a hot key; '$key' is constant per key " +
        "— pass a row-level column (an id, a timestamp)")
    val clash = (left.columns ++ right.columns).filter(_ == "_sj_salt")
    require(clash.isEmpty, "saltedJoin reserves _sj_salt — rename upstream")
    val overlap = left.columns.toSeq.intersect(right.columns.toSeq)
      .filterNot(_ == key)
    require(overlap.isEmpty,
      s"left/right column collision ${overlap.mkString(", ")} — rename upstream")
    val isHot = col(key).isin(hotKeys: _*)
    val l = left.withColumn("_sj_salt",
      when(isHot, pmod(xxhash64(col(scatterCol)), lit(salt.toLong)))
        .otherwise(lit(0L)))
    val r = right.withColumn("_sj_salt",
      explode(when(isHot, sequence(lit(0L), lit(salt.toLong - 1L)))
        .otherwise(array(lit(0L)))))
    l.join(r, Seq(key, "_sj_salt")).drop("_sj_salt")
  }
}
