package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.functions.Sketches.{Hll, SpaceSaving, TDigest}

/** Sketch aggregates: t-digest rank-error bounds vs exact quantiles,
  * merge ≡ whole-stream equivalence, SpaceSaving heavy-hitter
  * guarantee and bound soundness, serialization round-trips, and the
  * distributed (partial → shuffle → merge) path through the DataFrame
  * API.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = sorted.indexWhere(_ >= v)
    if (i < 0) 1.0 else i.toDouble / sorted.length
  }

  test("tdigest: rank error within 1% on uniform and heavy-tailed data") {
    val rnd = new scala.util.Random(42)
    val uniform = Array.fill(20000)(rnd.nextDouble() * 1000)
    val pareto = Array.fill(20000)(math.pow(1 - rnd.nextDouble(), -1.5))
    for (data <- Seq(uniform, pareto)) {
      val d = new TDigest(100.0)
      data.foreach(d.add(_))
      val sorted = data.sorted
      for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val est = d.quantile(q)
        val err = math.abs(rankOf(sorted, est) - q)
        assert(err < 0.01, s"q=$q est=$est rank err $err")
      }
    }
  }

  test("tdigest: merged halves agree with the whole stream within bound") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(10000)(rnd.nextGaussian() * 50 + 200)
    val whole = new TDigest(100.0); data.foreach(whole.add(_))
    val a = new TDigest(100.0); data.take(5000).foreach(a.add(_))
    val b = new TDigest(100.0); data.drop(5000).foreach(b.add(_))
    a.addAll(b)
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val errMerged = math.abs(rankOf(sorted, a.quantile(q)) - q)
      assert(errMerged < 0.015, s"merged rank err $errMerged at q=$q")
    }
  }

  test("tdigest: serialization round-trip preserves quantiles exactly") {
    val d = new TDigest(50.0)
    (1 to 5000).foreach(i => d.add(i.toDouble))
    val d2 = TDigest.fromBytes(d.toBytes)
    for (q <- Seq(0.0, 0.25, 0.5, 0.99))
      assert(d.quantile(q) === d2.quantile(q))
  }

  test("tdigest: centroid count stays bounded by the compression") {
    val rnd = new scala.util.Random(3)
    val d = new TDigest(100.0)
    (1 to 100000).foreach(_ => d.add(rnd.nextDouble()))
    d.compress()
    assert(d.n <= 200, s"centroids ${d.n} exceed 2x compression")
  }

  test("spacesaving: every item with freq > n/capacity survives; bounds sound") {
    // zipf-ish stream: item i appears ~ 10000/i times, capacity 20
    val stream = (1 to 60).flatMap(i => Seq.fill(10000 / i)(s"item$i"))
    val shuffled = new scala.util.Random(11).shuffle(stream)
    val s = new SpaceSaving(20)
    shuffled.foreach(s.add(_))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val kept = s.topK(20).map(_._1).toSet
    exact.filter(_._2 > n / 20).keys.foreach(i =>
      assert(kept.contains(i), s"heavy hitter $i evicted"))
    s.topK(20).foreach { case (item, cnt, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(truth <= cnt && cnt - err <= truth,
        s"$item: bounds [${cnt - err},$cnt] miss truth $truth")
    }
  }

  test("spacesaving: merge of shards covers shard-spanning heavy hitters") {
    val shard1 = Seq.fill(500)("big") ++ (1 to 300).map(i => s"a$i")
    val shard2 = Seq.fill(500)("big") ++ (1 to 300).map(i => s"b$i")
    val s1 = new SpaceSaving(50); shard1.foreach(s1.add(_))
    val s2 = new SpaceSaving(50); shard2.foreach(s2.add(_))
    s1.mergeIn(s2)
    val top = s1.topK(1)
    assert(top.head._1 === "big")
    assert(top.head._2 >= 1000, s"merged estimate ${top.head._2} under-counts")
  }

  test("spacesaving: exact when capacity >= cardinality (the oracled regime)") {
    val stream = new scala.util.Random(5).shuffle(
      (1 to 8).flatMap(i => Seq.fill(i * 7)(s"v$i")))
    val s = new SpaceSaving(16)
    stream.foreach(s.add(_))
    s.topK(8).foreach { case (item, cnt, err) =>
      val truth = item.drop(1).toLong * 7
      assert(cnt === truth && err === 0L)
    }
  }

  test("distributed path: sketch aggregates agree with exact over the documents table") {
    val docs = Tables(spark, sf, "documents")
    // t-digest p50 per source within 2 ranks of the exact median
    val est = docs.repartition(4, $"source")
      .groupBy($"source")
      .agg(Sketches.tdigestQuantiles($"n_chars".cast("double"), 100.0, Seq(0.5)).as("qv"))
      .select($"source", element_at($"qv", 1).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = docs.groupBy($"source")
      .agg(expr("percentile(n_chars, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val counts = docs.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (src, p50) =>
      val vals = docs.where($"source" === src).select($"n_chars")
        .collect().map(_.getLong(0).toDouble).sorted
      val r = rankOf(vals, p50)
      assert(math.abs(r - 0.5) <= math.max(0.02, 2.0 / counts(src)),
        s"$src: est $p50 (rank $r) vs exact ${exact(src)}")
    }
    // SpaceSaving with big capacity == exact lang counts
    val sk = docs.groupBy($"source")
      .agg(Sketches.topkSketch($"lang", 16, 16).as("top"))
      .select($"source", explode($"top").as("e"))
      .select($"source", $"e.item".as("lang"), $"e.count_hi".as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exactLang = docs.groupBy($"source", $"lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sk === exactLang)
  }

  test("hll: estimate within 3% at 100k distinct; merge == whole stream") {
    val h = new Hll(14)
    val a = new Hll(14); val b = new Hll(14)
    var i = 0L
    while (i < 100000L) {
      // xxhash-free unit path: feed a splitmix64-style scramble so the
      // register distribution matches a real hash
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      h.add(z)
      (if (i % 2 == 0) a else b).add(z)
      i += 1
    }
    val err = math.abs(h.estimate - 100000L) / 100000.0
    assert(err < 0.03, s"estimate ${h.estimate} err $err")
    a.mergeIn(b)
    assert(a.estimate === h.estimate) // register-max merge is exact
  }

  test("hll: small-range linear counting is near-exact at low cardinality") {
    val h = new Hll(14)
    (1 to 500).foreach(i => h.add(graft.functions.TextHashing.mix64(i.toLong)))
    assert(math.abs(h.estimate - 500L) <= 5, s"got ${h.estimate}")
  }

  test("hll: serialization round-trip preserves the registers") {
    val agg = Sketches.HllAgg(null, 12)
    val h = new Hll(12)
    (1 to 10000).foreach(i => h.add(i.toLong * 0x2545f4914f6cdd1dL))
    val back = agg.deserialize(agg.serialize(h))
    assert(back.p === 12 && back.regs.toSeq === h.regs.toSeq)
  }

  test("distributed path: hll per-group estimates track exact distinct counts") {
    val ev = Tables(spark, sf, "events")
    val est = ev.repartition(8)
      .groupBy($"event_type")
      .agg(Sketches.hllDistinct($"user_id").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val e = est(t)
      assert(math.abs(e - n) <= math.max(3.0, 0.03 * n),
        s"$t: est $e vs exact $n")
    }
  }

  test("hll skips nulls, matching count(DISTINCT) semantics exactly") {
    // regression: xxhash64(null) is the non-null seed, so an unguarded
    // hash would count NULL as one extra distinct value
    val df = Seq(Some("a"), Some("b"), None, Some("a"), None, Some("c"))
      .toDF("v")
    val row = df.agg(
      Sketches.hllDistinct($"v").as("est"),
      countDistinct($"v").as("exact")).first()
    assert(row.getLong(0) === 3L && row.getLong(1) === 3L)
    // all-null input estimates zero, like count(DISTINCT)
    val allNull = Seq[Option[String]](None, None).toDF("v")
      .agg(Sketches.hllDistinct($"v")).first().getLong(0)
    assert(allNull === 0L)
  }

  test("count-min sketch: bounded, mass-preserving, never undercounts; merge == whole") {
    import graft.operators.Cms
    // 50 distinct keys with skewed counts (key i appears i times)
    val df = (1 to 50).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")
    val n = df.count()
    val sk = Cms.build(df, "k", d = 4, w = 64)
    assert(sk.count() <= 4L * 64)
    // every hash row carries the full mass
    val mass = sk.groupBy($"r").agg(sum($"cnt").as("m")).collect()
    assert(mass.length == 4 && mass.forall(_.getLong(1) == n))
    // the CMS guarantee, corpus-wide: est >= true for EVERY key
    val est = Cms.estimate(df.distinct(), "k", sk, d = 4, w = 64)
    val exact = df.groupBy($"k").agg(count(lit(1)).as("n_true"))
    val joined = est.join(exact, Seq("k"))
    assert(joined.where($"est" < $"n_true").count() == 0)
    // at this load factor (50 keys, 4x64 buckets) most keys are exact
    assert(joined.where($"est" === $"n_true").count() >= 40)
    // shard-and-merge equals building over the whole corpus
    val Array(a, b) = df.randomSplit(Array(0.5, 0.5), seed = 7)
    val merged = Cms.merge(Cms.build(a, "k", 4, 64), Cms.build(b, "k", 4, 64))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = sk.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
    // the production xxhash kernel satisfies the same guarantees
    val skF = Cms.build(df, "k", d = 4, w = 64, portable = false)
    assert(skF.groupBy($"r").agg(sum($"cnt").as("m")).collect()
      .forall(_.getLong(1) == n))
    val estF = Cms.estimate(df.distinct(), "k", skF, d = 4, w = 64, portable = false)
    assert(estF.join(exact, Seq("k")).where($"est" < $"n_true").count() == 0)
  }

  test("cms join-size estimate: never undercounts; disjoint keys estimate ~zero") {
    import graft.operators.Cms
    val a = Seq.fill(3)("x").++(Seq.fill(2)("y")).toDF("k")
    val b = Seq.fill(4)("x").++(Seq.fill(5)("z")).toDF("k")
    // true |A ⋈ B| on k: only x matches → 3·4 = 12
    val est = Cms.joinSizeEstimate(
      Cms.build(a, "k", d = 4, w = 64), Cms.build(b, "k", d = 4, w = 64))
      .first().getLong(0)
    assert(est >= 12, s"AMS estimate must not undercount: $est")
    // with 3 distinct keys in 4×64 buckets the min row is collision-
    // free, so the estimate is exact here
    assert(est == 12, s"expected exact on this fixture, got $est")
    // disjoint key sets: some hash row has no shared bucket → min 0
    val dA = Seq("p", "q").toDF("k")
    val dB = Seq("u", "v").toDF("k")
    val dEst = Cms.joinSizeEstimate(
      Cms.build(dA, "k", d = 4, w = 64), Cms.build(dB, "k", d = 4, w = 64))
      .first().getLong(0)
    assert(dEst == 0, s"disjoint keys should estimate 0, got $dEst")
    // self-join estimate bounds the true second moment from above
    val selfTrue = 3L * 3 + 2L * 2
    val selfEst = Cms.joinSizeEstimate(
      Cms.build(a, "k", d = 4, w = 64), Cms.build(a, "k", d = 4, w = 64))
      .first().getLong(0)
    assert(selfEst >= selfTrue)
    // the row universe comes from the sketches, so a non-default d
    // does NOT zero the estimate (the d-parameter mismatch bug)
    val est2 = Cms.joinSizeEstimate(
      Cms.build(a, "k", d = 2, w = 64), Cms.build(b, "k", d = 2, w = 64))
      .first().getLong(0)
    assert(est2 >= 12, s"d=2 sketches must still never undercount: $est2")
    // two EMPTY sketches: zero rows on both sides must estimate 0,
    // not a NULL that breaks downstream planner arithmetic
    val empty = Cms.build(a.where($"k" === "nope"), "k", d = 4, w = 64)
    val eRow = Cms.joinSizeEstimate(empty, empty).first()
    assert(!eRow.isNullAt(0) && eRow.getLong(0) == 0L,
      s"empty sketches should estimate 0, got $eRow")
  }

  test("hex_slice_long equals conv(substring, 16, 10) on md5 hex — the oracle contract") {
    import graft.functions.TextHashFunctions.hex_slice_long
    // the codegen'd bucket kernel must be VALUE-identical to the SQL
    // form the DuckDB oracle replays, across all four slice offsets
    val hexes = Tables(spark, sf, "lineitem").limit(2000)
      .select(md5(concat(lit("cms:"), $"l_partkey".cast("string"))).as("h"))
    val mismatches = (0 until 4).map { r =>
      hexes.where(hex_slice_long($"h", 1 + 8 * r) =!=
        conv(substring($"h", 1 + 8 * r, 8), 16, 10).cast("long")).count()
    }.sum
    assert(mismatches == 0L, s"$mismatches slice mismatches")
    // conv edge behaviors the kernel mirrors: short input, non-hex tail
    val edge = Seq("ff", "f!aa", "ABCDEF01").toDF("h")
    val got = edge.select(hex_slice_long($"h", 1).as("v"),
      conv(substring($"h", 1, 8), 16, 10).cast("long").as("w")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // the ONE documented divergence: a slice entirely past the end
    // parses to 0, where conv(substring) = conv('') = NULL — callers
    // must not rely on NULL propagation (unreachable from md5 sites)
    val past = Seq(Tuple1("ff")).toDF("h")
      .select(hex_slice_long($"h", 9).as("v"),
        conv(substring($"h", 9, 8), 16, 10).cast("long").as("w")).first()
    assert(!past.isNullAt(0) && past.getLong(0) == 0L && past.isNullAt(1))
  }
}
