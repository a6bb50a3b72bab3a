package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** TF-IDF / BM25 retrieval-scoring contracts (SURVEY §2.9). */
class SearchSpec extends SparkSuite {

  test("tfidf matches the hand-computed weights on a toy corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = Search.tfidf(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // N=2; a: df=2 -> ln(1)=0; b,c: df=1 -> ln(2)=0.693147
    assert(out((1L, "a")) == ((2L, 2L, 0.0)))
    assert(out((1L, "b")) == ((1L, 1L, 0.693147)))
    assert(out((2L, "a")) == ((1L, 2L, 0.0)))
    assert(out((2L, "c")) == ((1L, 1L, 0.693147)))
  }

  test("bm25 matches the hand-computed Okapi formula") {
    import spark.implicits._
    // d1 = "x x y" (dl=3), d2 = "y z" (dl=2); query {x}; N=2, avgdl=2.5
    // df(x)=1, idf = ln(1 + 1.5/1.5) = ln 2
    // tf=2: ln2 * 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2.5)) = ln2 * 4.4/3.38
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = Search.bm25(docs, "doc_id", "text", Seq("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L,
      math.rint(math.log(2) * 4.4 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5)) * 1e4) / 1e4,
      1L)))
  }

  test("bm25 ranks the term-denser document higher at equal length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join join join scan scan"),
      (2L, "join scan scan scan scan"),
      (3L, "scan scan scan scan scan")).toDF("doc_id", "text")
    val s = Search.bm25(docs, "doc_id", "text", Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.keySet == Set(1L, 2L), "only matching docs are scored")
    assert(s(1L) > s(2L), s"tf=3 should outscore tf=1: $s")
  }

  test("bm25 statistics sides broadcast; only matching postings shuffle") {
    val docs = Tables(spark, sf, "documents")
    val plan = Search.bm25(docs, "doc_id", "text", Seq("join", "window"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"df/stats should ride broadcast joins:\n$plan")
  }

  test("bm25Scorer: map-only scoring matches the distributed bm25 on matching docs") {
    val docs = Tables(spark, sf, "documents")
    val terms = Seq("join", "window", "hash")
    val scorer = Search.bm25Scorer(docs, "text", terms)
    val viaScorer = docs.select(col("doc_id"), scorer(col("text")).as("s"))
      .where(col("s") > 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaBm25 = Search.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaScorer.keySet == viaBm25.keySet)
    viaBm25.foreach { case (id, s) =>
      assert(math.abs(viaScorer(id) - s) <= 0.0001, s"doc $id: ${viaScorer(id)} vs $s")
    }
    // and the scorer's plan is join-free (pure projection)
    val plan = docs.select(scorer(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"scorer must be a map-only projection:\n$plan")
  }

  test("tfidf on the real corpus: weights are 0 for universal terms, positive otherwise") {
    val docs = Tables(spark, sf, "documents")
    val out = Search.tfidf(docs, "doc_id", "text")
    assert(out.where(col("tfidf") < 0).count() == 0, "tfidf is non-negative")
    val n = docs.count()
    // terms present in every doc get weight exactly 0
    assert(out.where(col("df") === n && col("tfidf") =!= 0.0).count() == 0)
  }
}
