package graft

import graft.rules.Catalog
import graft.sinks.SqlSink
import graft.sources.{ConnectorFeed, SqlBridges, SqlLookupSource, SqlSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SQL connector tests against an embedded Derby database (on the
  * provided Spark classpath) — source progressive pulls + offsets,
  * lookup point queries with predicate pushdown, sink append and
  * changelog paths, and the DDL surface.
  */
class SqlSpec extends SparkSuite {

  private val dburl = "jdbc:derby:memory:graftsql;create=true"

  private def withDb[A](f: java.sql.Connection => A): A =
    SqlBridges.withConnection(dburl, Map.empty)(f)

  private def exec(sqls: String*): Unit = withDb { c =>
    val st = c.createStatement()
    sqls.foreach(st.execute)
  }

  private def freshTable(name: String, ddl: String, rows: String*): Unit = {
    withDb { c =>
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $name") catch { case _: java.sql.SQLException => () }
      st.execute(s"CREATE TABLE $name $ddl")
      rows.foreach(st.execute)
    }
  }

  test("sql source: plain table scan through Spark's JDBC reader") {
    freshTable("readings", "(id INT, sensor VARCHAR(32), temp DOUBLE)",
      "INSERT INTO readings VALUES (1, 'a', 21.5), (2, 'b', 22.5), (3, 'a', 23.0)")
    val df = SqlSource(dburl, "readings").batch(spark)
    assert(df.count() == 3)
    assert(df.filter(col("SENSOR") === "a").count() == 2)
  }

  test("sql source: progressive index pulls see only new rows and track offsets") {
    freshTable("tick", "(id INT, v VARCHAR(16))",
      "INSERT INTO tick VALUES (1, 'one'), (2, 'two')")
    val src = SqlSource(dburl, "tick", indexFields = Seq("id"), limit = 10)
    assert(src.queryStatement ==
      "SELECT * FROM tick ORDER BY id ASC FETCH FIRST 10 ROWS ONLY")
    assert(src.batch(spark).count() == 2)
    assert(src.offset == Map("id" -> 2)) // advanced to max pulled id
    assert(src.queryStatement ==
      "SELECT * FROM tick WHERE id > 2 ORDER BY id ASC FETCH FIRST 10 ROWS ONLY")
    exec("INSERT INTO tick VALUES (3, 'three')")
    val second = src.batch(spark)
    assert(second.collect().map(r => r.getInt(0)).toSeq == Seq(3))
    // rewind replays from an older checkpointed offset (reference Rewind)
    src.rewind(Map("id" -> 1))
    assert(src.batch(spark).count() == 2)
  }

  test("sql source: LIMIT bounds a pull and the offset resumes mid-table") {
    freshTable("seqd", "(id INT, v INT)",
      "INSERT INTO seqd VALUES (1, 10), (2, 20), (3, 30), (4, 40), (5, 50)")
    val src = SqlSource(dburl, "seqd", indexFields = Seq("id"), limit = 2)
    assert(src.batch(spark).collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(src.offset == Map("id" -> 2))
    assert(src.batch(spark).collect().map(_.getInt(0)).toSeq == Seq(3, 4))
    assert(src.batch(spark).collect().map(_.getInt(0)).toSeq == Seq(5))
  }

  test("sql source: LIMIT-boundary ties on a non-unique index are never skipped") {
    // ts is non-unique; a naive full-page advance to MAX(ts) would
    // permanently skip the tied rows beyond the LIMIT cut
    freshTable("ties", "(ts INT, v INT)",
      "INSERT INTO ties VALUES (1, 100), (1, 101), (1, 102), (2, 200), (2, 201), (3, 300)")
    val src = SqlSource(dburl, "ties", indexFields = Seq("ts"), limit = 2)
    // page of two ts=1 rows is all one value: the pull takes every
    // tied row instead of cutting mid-tie
    assert(src.batch(spark).collect().map(_.getInt(1)).sorted.toSeq == Seq(100, 101, 102))
    assert(src.offset == Map("ts" -> 1))
    assert(src.batch(spark).collect().map(_.getInt(1)).sorted.toSeq == Seq(200, 201))
    assert(src.batch(spark).collect().map(_.getInt(1)).toSeq == Seq(300))
    // mixed page with a CUT tie (four ts=2 rows, page holds two):
    // retreat below the page max rather than split the tie group
    freshTable("ties2", "(ts INT, v INT)",
      "INSERT INTO ties2 VALUES (1, 1), (2, 2), (2, 3), (2, 4), (3, 5)")
    val src2 = SqlSource(dburl, "ties2", indexFields = Seq("ts"), limit = 3)
    assert(src2.batch(spark).collect().map(_.getInt(1)).toSeq == Seq(1))
    assert(src2.offset == Map("ts" -> 1))
    assert(src2.batch(spark).collect().map(_.getInt(1)).sorted.toSeq == Seq(2, 3, 4))
    assert(src2.batch(spark).collect().map(_.getInt(1)).toSeq == Seq(5))
    // a page with ties fully inside it advances normally, no retreat
    freshTable("ties3", "(ts INT, v INT)",
      "INSERT INTO ties3 VALUES (1, 1), (2, 2), (2, 3), (3, 4)")
    val src3 = SqlSource(dburl, "ties3", indexFields = Seq("ts"), limit = 3)
    assert(src3.batch(spark).collect().map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
    assert(src3.offset == Map("ts" -> 2))
    assert(src3.batch(spark).collect().map(_.getInt(1)).toSeq == Seq(4))
  }

  test("sql lookup source: point query pushes equality filters to the database") {
    freshTable("dims", "(k VARCHAR(8), region VARCHAR(16), pop INT)",
      "INSERT INTO dims VALUES ('a', 'east', 10), ('b', 'west', 20), ('c', 'east', 30)")
    val lk = SqlLookupSource(dburl, "dims")
    val hit = lk.lookup(spark, Seq("REGION", "POP"), Seq("K"), Seq("b"))
    assert(hit.collect().toSeq == Seq(Row("west", 20)))
    // the equality predicate must reach the JDBC scan, not run in Spark
    val pushed = hit.queryExecution.executedPlan.toString()
    assert(pushed.contains("PushedFilters") && pushed.contains("EqualTo"),
      s"expected pushed-down JDBC filter, got:\n$pushed")
  }

  test("sql sink: append path inserts distributed via the JDBC writer") {
    freshTable("outt", "(name VARCHAR(32), total INT)")
    val df = spark.createDataFrame(Seq(("x", 1), ("y", 2), ("z", 3)))
      .toDF("NAME", "TOTAL")
    SqlSink(dburl, "outt").writeBatch(df)
    val back = SqlSource(dburl, "outt").batch(spark)
    assert(back.count() == 3)
    assert(back.agg(sum("TOTAL")).head.getLong(0) == 6)
  }

  test("sql sink: changelog rowkind applies insert/update/delete by key") {
    freshTable("state", "(k VARCHAR(8), v INT)",
      "INSERT INTO state VALUES ('a', 1), ('b', 2)")
    val changes = spark.createDataFrame(Seq(
      ("insert", "c", 3), ("update", "a", 10), ("delete", "b", 0)))
      .toDF("action", "K", "V")
    SqlSink(dburl, "state",
      Map("rowKindField" -> "action", "keyField" -> "K")).writeBatch(changes)
    val rows = withDb { c =>
      val rs = c.createStatement().executeQuery("SELECT k, v FROM state ORDER BY k")
      Iterator.continually(rs).takeWhile(_.next()).map(r => r.getString(1) -> r.getInt(2)).toList
    }
    assert(rows == List("a" -> 10, "c" -> 3))
  }

  test("sql sink: invalid rowkind fails the batch") {
    freshTable("state2", "(k VARCHAR(8), v INT)")
    val bad = spark.createDataFrame(Seq(("upsert-ish", "a", 1))).toDF("action", "K", "V")
    val e = intercept[Exception] {
      SqlSink(dburl, "state2",
        Map("rowKindField" -> "action", "keyField" -> "K")).writeBatch(bad)
    }
    assert(e.getMessage != null)
  }

  test("sql source: streaming bridge pulls on an interval into the connector feed") {
    freshTable("evs", "(id INT, label VARCHAR(16))",
      "INSERT INTO evs VALUES (1, 'boot')")
    val src = SqlSource(dburl, "evs", indexFields = Seq("id"), intervalMs = 100)
    ConnectorFeed.clear("sql", src.feedTopic)
    try {
      assert(SqlBridges.pullOnce(src) == 1) // first manual tick drains the table
      exec("INSERT INTO evs VALUES (2, 'tick'), (3, 'tock')")
      assert(SqlBridges.pullOnce(src) == 2) // only the new rows
      assert(SqlBridges.pullOnce(src) == 0) // nothing newer
      val frames = ConnectorFeed.frames(spark, "sql", src.feedTopic)
      assert(frames.count() == 3)
      // frames decode as typed rows through the connector stream path
      val decoded = spark.read.json(
        frames.select(col("frame").as("value")).as(org.apache.spark.sql.Encoders.STRING))
      assert(decoded.select(sum("ID")).head.getLong(0) == 6)
    } finally ConnectorFeed.clear("sql", src.feedTopic)
  }

  test("sql stream: a streaming rule tails the table end-to-end") {
    freshTable("live_ev", "(id INT, v INT)", "INSERT INTO live_ev VALUES (1, 10)")
    val src = SqlSource(dburl, "live_ev", indexFields = Seq("id"), intervalMs = 150)
    ConnectorFeed.clear("sql", src.feedTopic)
    val stream = src.stream(spark) // starts the interval-pull bridge
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("sql_live").start()
    try {
      // rows inserted AFTER the stream starts must arrive as new batches
      exec("INSERT INTO live_ev VALUES (2, 20), (3, 30)")
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def seen: Long = spark.sql("SELECT count(*) FROM sql_live").head.getLong(0)
      while (seen < 3 && System.nanoTime() < deadline) { q.processAllAvailable(); Thread.sleep(100) }
      assert(seen == 3, s"expected 3 streamed rows, saw $seen")
      val sum = spark.sql("SELECT sum(V) FROM sql_live").head.getLong(0)
      assert(sum == 60)
    } finally {
      q.stop()
      graft.sources.SqlBridges.closeAll()
      ConnectorFeed.clear("sql", src.feedTopic)
    }
  }

  test("PUT /rules/{id}/reset_state rewinds a running rule's sql offset") {
    import graft.rules.{RuleApi, RuleEngine}
    freshTable("rst_ev", "(id INT, v INT)", "INSERT INTO rst_ev VALUES (1, 5), (2, 7)")
    val eng = new RuleEngine(spark)
    val a = new RuleApi(eng)
    assert(a.handle("POST", "/streams",
      s"""{"sql":"CREATE STREAM rstev () WITH (TYPE=\\"sql\\", DBURL=\\"$dburl\\", DATASOURCE=\\"rst_ev\\", INDEXFIELD=\\"id\\", INTERVAL=\\"150\\")"}""")._1 == 200)
    val src = eng.catalog.get("rstev").get.source.asInstanceOf[SqlSource]
    ConnectorFeed.clear("sql", src.feedTopic)
    assert(a.handle("POST", "/rules",
      """{"id":"r_rst","sql":"SELECT id, v FROM rstev","streaming":true,"actions":[{"memory":{"topic":"rst_out"}}]}""")._1 == 200)
    graft.sources.MemoryHub.drop("rst_out")
    assert(a.handle("POST", "/rules/r_rst/start")._1 == 200)
    try {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def pulled: Long =
        try graft.sources.MemoryHub.frame(spark, "rst_out").count()
        catch { case _: Exception => 0 }
      while (pulled < 2 && System.nanoTime() < deadline) {
        eng.processAllAvailable("r_rst"); Thread.sleep(100)
      }
      assert(pulled == 2, s"expected the 2 seed rows, saw $pulled")
      assert(src.offset == Map("id" -> 2))
      // not running → refused for a stopped rule (reference contract):
      // checked via an unknown stream first, then the real rewind
      val (cBad, bBad) = a.handle("PUT", "/rules/r_rst/reset_state",
        """{"type":0,"params":{"streamName":"nope","input":{"id":0}}}""")
      assert(cBad == 404 && bBad.contains("not found"))
      val (cOk, bOk) = a.handle("PUT", "/rules/r_rst/reset_state",
        """{"type":0,"params":{"streamName":"rstev","input":{"id":0}}}""")
      assert(cOk == 200 && bOk.contains("success"), bOk)
      assert(src.offset == Map("id" -> 0L))
      // the running bridge re-pulls everything past the rewound offset
      while (pulled < 4 && System.nanoTime() < deadline) {
        eng.processAllAvailable("r_rst"); Thread.sleep(100)
      }
      assert(pulled >= 4, s"rewound pull should replay rows, saw $pulled")
      // unknown stateType refused like the reference
      assert(a.handle("PUT", "/rules/r_rst/reset_state",
        """{"type":7,"params":{}}""")._1 == 400)
    } finally {
      try eng.stop("r_rst") catch { case _: Exception => () }
      graft.sources.SqlBridges.closeAll()
      ConnectorFeed.clear("sql", src.feedTopic)
    }
  }

  test("sql DDL: stream and lookup table register through the catalog") {
    freshTable("ddl_ev", "(id INT, v VARCHAR(8))", "INSERT INTO ddl_ev VALUES (1, 'x')")
    val cat = new Catalog
    val st = cat.executeDdl(
      s"""CREATE STREAM sqev () WITH (TYPE="sql", DBURL="$dburl", DATASOURCE="ddl_ev",
         | INDEXFIELD="id", INTERVAL="200")""".stripMargin)
    val sqlSrc = st.source.asInstanceOf[SqlSource]
    assert(sqlSrc.indexFields == Seq("id") && sqlSrc.intervalMs == 200)
    assert(sqlSrc.batch(spark).count() == 1)

    val tb = cat.executeDdl(
      s"""CREATE TABLE sqdim () WITH (TYPE="sql", DBURL="$dburl", DATASOURCE="ddl_ev")""")
    assert(tb.isTable && tb.source.isInstanceOf[SqlLookupSource])
    assert(tb.source.batch(spark).count() == 1)
  }

  test("sql dialects: limit clause renders per target database") {
    import graft.sources.SqlDialect._
    assert(limited("SELECT * FROM t", 5, "ansi") == "SELECT * FROM t FETCH FIRST 5 ROWS ONLY")
    assert(limited("SELECT * FROM t", 5, "limit") == "SELECT * FROM t LIMIT 5")
    assert(limited("SELECT * FROM t", 5, "top") == "SELECT TOP 5 * FROM t")
    assert(limited("SELECT * FROM t", 5, "rownum") ==
      "SELECT * FROM (SELECT * FROM t) WHERE ROWNUM <= 5")
    assert(literal("o'brien") == "'o''brien'")
    intercept[IllegalArgumentException](checkIdentifier("t; DROP TABLE x"))
  }
}
