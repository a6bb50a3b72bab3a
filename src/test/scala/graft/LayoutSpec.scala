package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Physical-layout contracts (SURVEY §4): salting spreads hot keys,
  * bucketing removes the join shuffle.
  */
class LayoutSpec extends SparkSuite {

  test("salted join: identical result set, hot key spread over salts") {
    // heavily skewed fact: 90% of rows on key 7
    val fact = spark.range(10000).toDF("i")
      .select(when(col("i") % 10 < 9, 7L).otherwise(col("i") % 100).as("k"),
        col("i").as("payload"))
    val dim = spark.range(100).toDF("k").withColumn("label", concat(lit("d"), col("k")))
    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum("payload")).first()
    val salted = Layout.saltedJoin(fact, dim, "k", saltFactor = 8)
      .agg(count(lit(1)), sum("payload")).first()
    assert(plain == salted, "salting must not change the join result")
    // the hot key's rows really get distinct salt values
    val salts = fact.withColumn("__salt", (rand(42) * 8).cast("int"))
      .where(col("k") === 7).select("__salt").distinct().count()
    assert(salts == 8)
  }

  test("outer salted join preserves unmatched rows exactly once") {
    val fact = spark.range(100).toDF("k").withColumn("v", col("k") * 2)
    val dim = spark.range(50).toDF("k").withColumn("label", lit("x"))
    val res = Layout.saltedJoin(fact, dim, "k", saltFactor = 4, joinType = "left")
    assert(res.count() == 100)
    assert(res.where(col("label").isNull).count() == 50)
  }

  test("salted join rejects dim-preserving join types") {
    // the dim side is replicated saltFactor x, so right/full outer would
    // emit every unmatched dim row saltFactor times — reject up front
    val fact = spark.range(10).toDF("k")
    val dim = spark.range(5).toDF("k")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer"))
      intercept[IllegalArgumentException](
        Layout.saltedJoin(fact, dim, "k", saltFactor = 4, joinType = jt))
    // left_semi / left_anti are fact-preserving and stay legal
    assert(Layout.saltedJoin(fact, dim, "k", joinType = "left_semi").count() == 5)
    assert(Layout.saltedJoin(fact, dim, "k", joinType = "left_anti").count() == 5)
  }

  test("bucketed tables join without a shuffle on either side") {
    val n = 1000
    Layout.writeBucketed(
      spark.range(n).toDF("k").withColumn("a", col("k") * 2), "graft_bkt_left", "k", 8)
    Layout.writeBucketed(
      spark.range(n).toDF("k").withColumn("b", col("k") + 1), "graft_bkt_right", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (tiny test tables would broadcast) —
      // the property under test is "no ShuffleExchange on either side"
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.readBucketed(spark, "graft_bkt_left")
        .join(Layout.readBucketed(spark, "graft_bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed equi-join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }

  test("sharded export: stable content-addressed shards, bounded files, lossless") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Layout.exportShards(docs, out, "text", shards = 4, maxRecordsPerFile = 50)
      val back = spark.read.parquet(out)
      // lossless round trip
      assert(back.count() == docs.count())
      assert(back.select("doc_id").except(docs.select("doc_id")).isEmpty)
      // exactly the requested shard directories
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.length == 4, dirs.mkString(","))
      // every file respects the record cap
      val files = dirs.flatMap(d => new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")))
      files.foreach { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        assert(n <= 50, s"${f.getName} has $n rows")
      }
      // shard assignment is content-addressed: a re-export of a GROWN
      // corpus keeps the original rows in the same shards
      val out2 = java.nio.file.Files.createTempDirectory("graft_shards2").toString
      try {
        Layout.exportShards(docs.unionByName(
          docs.limit(10).select((col("doc_id") + 900000).as("doc_id"),
            concat_ws(" ", col("text"), col("doc_id")).as("text"))),
          out2, "text", shards = 4, maxRecordsPerFile = 50)
        val m1 = back.select("doc_id", "shard").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val m2 = spark.read.parquet(out2).select("doc_id", "shard").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(m1.forall { case (id, s) => m2(id) == s },
          "unchanged rows must stay in their shard on re-export")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out2))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("key histogram surfaces the skew") {
    val fact = spark.range(1000).toDF("i")
      .select(when(col("i") % 10 < 9, 7L).otherwise(col("i")).as("k"))
    val top = Layout.keyHistogram(fact, col("k"), 1).first()
    assert(top.getLong(0) == 7L && top.getLong(1) == 900L)
  }

  test("zipWithGlobalIndex equals a global sort's row_number at any partition count") {
    import spark.implicits._
    val data = new scala.util.Random(13).shuffle((1L to 5000L).toList)
      .map(i => (i, s"v$i")).toDF("k", "v")
    val want = data.orderBy(col("k")).collect().map(_.getLong(0)).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    for (parts <- Seq(3, 8)) {
      val got = Layout.zipWithGlobalIndex(data.repartition(parts), Seq(col("k")))
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("pos")).toMap
      assert(got == want, s"at $parts input partitions")
    }
    // no single-partition global sort in the plan
    val plan = Layout.zipWithGlobalIndex(data, Seq(col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }
}
