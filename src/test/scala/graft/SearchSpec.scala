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

  test("hybridRrf: rank fusion math, both-sides boost, and no corpus-wide sort") {
    import spark.implicits._
    // doc 1 is top of BOTH rankings (all three query terms, incl. the
    // two rare high-idf ones); doc 2 lexical-only; doc 3 dense-only
    val docs = Seq((1L, "join window hash"), (2L, "join join"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1f, 0f)), // the query vector row
      (1L, Array(0.9f, 0.1f)), (2L, Array(-1f, 0f)), (3L, Array(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val out = Search.hybridRrf(docs, "doc_id", "text",
      Seq("join", "window", "hash"), embs, "vec_id", "embedding",
      Seq(1f, 0f), rrfK = 60, poolK = 10, topK = 10)
    val rows = out.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    // doc 1: lex_rank 1 (three hits) and dense rank behind vec 0 itself
    val (l1, d1, rrf1) = rows(1L)
    assert(l1.contains(1))
    // rrf is rounded to 6 dp in the operator (oracle-hash stability)
    assert(math.abs(rrf1 - (1.0 / (60 + l1.get.asInstanceOf[Int].toDouble) +
      1.0 / (60 + d1.get.asInstanceOf[Int].toDouble))) < 1e-6)
    // doc appearing in both rankings beats single-ranking docs here
    assert(rrf1 > rows(2L)._3 && rrf1 > rows(3L)._3)
    // a doc with no bm25 match still surfaces through the dense side
    assert(rows(3L)._1.isEmpty && rows(3L)._2.nonEmpty)
    // scale property: candidate pools come from TakeOrdered (per-
    // partition top-k), never a corpus-wide Sort+Exchange
    val plan = Search.hybridRrf(Tables(spark, sf, "documents"), "doc_id",
        "text", Seq("join"), Tables(spark, sf, "embeddings"), "vec_id",
        "embedding", Seq.fill(16)(0.1f))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("hybrid stream scoring stage is map-only: zero exchanges before the state regroup") {
    val docs = Tables(spark, sf, "documents")
    val emb = Tables(spark, sf, "embeddings")
    val joined = docs.select(col("doc_id"), col("text")).join(
      emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .localCheckpoint(true) // isolate the scoring stage from the fixture join
    val terms = Seq("join", "window", "hash")
    val scorer = Search.bm25Scorer(docs, "text", terms)
    val plan = Search.hybridArrivalScores(joined, scorer, "doc_id", "text",
        "embedding", terms, Seq.fill(64)(0.1f))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"arrival scoring must stay a map-only projection (corpus never shuffles):\n$plan")
  }
}
