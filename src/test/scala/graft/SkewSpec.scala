package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Key-skew audit + salt-mitigated join (SURVEY §2.9): the audit's
  * numbers are hand-checked, and the salted join must be ROW-IDENTICAL
  * to the plain join on a deliberately skewed fixture — salting changes
  * task balance, never the answer.
  */
class SkewSpec extends SparkSuite {

  import spark.implicits._

  // planted skew: key 7 owns 1000 rows, keys 1-5 own 10 each
  private def skewedLeft = {
    val hot = (1 to 1000).map(i => (7L, i.toLong, s"h$i"))
    val cold = for (k <- 1 to 5; i <- 1 to 10)
      yield (k.toLong, (k * 1000 + i).toLong, s"c$k-$i")
    (hot ++ cold).toDF("k", "row_id", "payload")
  }

  private def dim =
    Seq((7L, "hot-dim"), (1L, "d1"), (2L, "d2"), (3L, "d3"),
      (4L, "d4"), (9L, "unmatched")).toDF("k", "label")

  test("audit: counts, share, ceil-div salt, ordering and truncation") {
    val rows = Skew.audit(skewedLeft, "k", topN = 3,
      targetRowsPerTask = 300L).collect()
    // 1050 rows total; key 7 leads with 1000
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 7L && rows(0).getLong(1) == 1000L)
    assert(rows(0).getDouble(2) == math.rint(1000.0 / 1050 * 1e6) / 1e6)
    assert(rows(0).getLong(3) == 4L, "ceil(1000/300) = 4")
    // ties among the 10-row keys break by key ascending
    assert(rows(1).getLong(0) == 1L && rows(2).getLong(0) == 2L)
    assert(rows(1).getLong(3) == 1L, "a cold key needs no salting")
  }

  test("salted join output is row-identical to the plain join") {
    val l = skewedLeft
    val plain = l.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(l, dim, key = "k",
      hotKeys = Seq(7L), salt = 8, scatterCol = "row_id")
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // multiset cardinality too (exceptAll is multiset-aware, but the
    // count makes the 1000-row hot fan-in explicit): 1000 hot + 4
    // matched cold keys × 10; key 5 has no dim row and drops out
    assert(salted.count() == plain.count() && plain.count() == 1040L)
  }

  test("salting actually scatters the hot key across sub-keys") {
    // the hot key's rows must land in >1 salt bucket (the whole point);
    // replicate the operator's scatter expression to observe it
    val buckets = skewedLeft.where($"k" === 7L)
      .select(pmod(xxhash64($"row_id"), lit(8L)).as("b"))
      .distinct().count()
    assert(buckets == 8L, s"expected all 8 salt buckets hit, got $buckets")
    // and the replication side fans the dim row out exactly salt times
    val salted = Skew.saltedJoin(skewedLeft, dim, key = "k",
      hotKeys = Seq(7L), salt = 8, scatterCol = "row_id")
    val s = salted.queryExecution.executedPlan.toString
    assert(s.contains("Generate explode"), s"right side must explode: $s")
  }

  test("degenerate cases: hot key absent from a side; all keys hot") {
    val l = skewedLeft
    // key 9 is only in dim: salting it must not invent or drop rows
    val a = Skew.saltedJoin(l, dim, "k", Seq(9L), salt = 4, scatterCol = "row_id")
    val plain = l.join(dim, Seq("k"))
    assert(a.exceptAll(plain).isEmpty && plain.exceptAll(a).isEmpty)
    // every key hot: still identical
    val b = Skew.saltedJoin(l, dim, "k", Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L),
      salt = 3, scatterCol = "row_id")
    assert(b.exceptAll(plain).isEmpty && plain.exceptAll(b).isEmpty)
  }

  test("guards: reserved salt column, overlapping columns, bad params") {
    val l = skewedLeft
    intercept[IllegalArgumentException](
      Skew.saltedJoin(l, dim, "k", Seq(7L), salt = 1, scatterCol = "row_id"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(l, dim, "k", Seq.empty, salt = 4, scatterCol = "row_id"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(l.withColumn("_sj_salt", lit(0L)), dim, "k",
        Seq(7L), salt = 4, scatterCol = "row_id"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(l, dim.withColumnRenamed("label", "payload"), "k",
        Seq(7L), salt = 4, scatterCol = "row_id"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(l, dim, "k", Seq(7L), salt = 4, scatterCol = "nope"))
    // audit reserves its four output names for the same reason
    intercept[IllegalArgumentException](
      Skew.audit(l.withColumnRenamed("k", "salt"), "salt"))
    intercept[IllegalArgumentException](
      Skew.audit(l.withColumnRenamed("k", "n_rows"), "n_rows"))
  }

  test("audit feeds saltedJoin: the q_skew_join composition on real tables") {
    val left = Tables(spark, sf, "lineitem").select(
      col("l_orderkey").as("okey"), col("l_partkey"),
      round(col("l_quantity"), 2).as("qty"))
    val right = Tables(spark, sf, "orders").select(
      col("o_orderkey").as("okey"), col("o_orderstatus"))
    val hot = Skew.audit(left, "okey", topN = 3, targetRowsPerTask = 2L)
      .select("okey").collect().map(_.getLong(0)).toSeq
    assert(hot.length == 3)
    val salted = Skew.saltedJoin(left, right, "okey", hot, salt = 4,
      scatterCol = "l_partkey")
    val plain = left.join(right, Seq("okey"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
