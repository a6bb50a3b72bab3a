package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring for training-data pipelines: TF-IDF
  * weights and Okapi BM25 ranking (Robertson & Zaragoza 2009, the
  * Lucene-default variant). Used for quality-driven selection ("keep
  * documents that look like the target domain"), decontamination
  * triage, and corpus search.
  *
  * Scale shape (both ops): the corpus explodes to (doc, term) postings
  * ONCE; document length is computed map-side before the explode; the
  * corpus-level statistics (N, avgdl, per-term document frequency) are
  * tiny by construction — N/avgdl is a single row and the df table has
  * one row per scored term — so they ride broadcast joins and the only
  * corpus-sized shuffle is the per-doc score regroup. With a query
  * term set, postings are filtered to matching terms BEFORE the
  * shuffle (a broadcast hash semi-join), so the regroup moves only the
  * matching postings, not the corpus.
  */
object Search {

  private def toks(textCol: Column): Column = TextOps.tokens(textCol)

  /** Per-(doc, term) TF-IDF over the whole corpus:
    * tf = raw term count in the doc, df = number of docs containing
    * the term, tfidf = tf · ln(N / df). One postings explode, one
    * (term)-keyed df aggregation (its output is vocabulary-sized, tiny
    * relative to the corpus), one per-(doc,term) regroup.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val postings = docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("term"))
    val tf = postings.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc, term), so document frequency
    // is a count over the small aggregate — no second corpus explode,
    // no corpus-sized countDistinct shuffle
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n)) // one row: the corpus size
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("tfidf"))
  }

  /** Okapi BM25 score of every document that matches ≥1 query term:
    *   idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
    *   s(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * Query terms broadcast as a literal; postings not matching a query
    * term are dropped at the scan side, so the per-doc regroup moves
    * O(matches), not O(corpus). dl (doc length in tokens) is computed
    * before the explode and carried on the posting rows — no second
    * corpus pass.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qset = typedlit(terms.map(_.toLowerCase))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(toks(col(textCol))).cast("double")).as("avgdl"))
    val postings = docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("double").as("dl"),
        explode(col("ts")).as("term"))
      .where(array_contains(qset, col("term")))
    val tf = postings.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // derived from the (doc, term)-grained aggregate, not a second
    // pass over the postings
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      ), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Stream-scoring twin of [[bm25]]: score ARRIVING documents
    * against a STATIC reference corpus's statistics (N, avgdl, df) —
    * the "route incoming docs by topic relevance" rule shape. The
    * statistics collapse to per-term constants at build time
    * (`terms` is small by definition), so scoring is one map-only
    * codegen projection with NO joins and no state: it runs
    * identically under Structured Streaming and on a batch frame.
    * The bounded collect is the per-term stat table — O(|terms|),
    * the same documented pattern as the IVF centroid pull.
    */
  def bm25Scorer(corpus: DataFrame, textCol: String, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): Column => Column = {
    val qset = terms.map(_.toLowerCase).distinct
    if (qset.isEmpty) return (_: Column) => lit(0.0)
    // ONE corpus pass builds every statistic: N, avgdl, and per-term
    // document frequency as conditional sums over the same scan
    val ts = toks(col(textCol))
    val aggs = Seq(count(lit(1)).as("n"),
      avg(size(ts).cast("double")).as("avgdl")) ++
      qset.map(t => sum(when(array_contains(ts, t), 1L).otherwise(0L)).as(s"df_$t"))
    val st = corpus.agg(aggs.head, aggs.tail: _*).head()
    val nDocs = st.getLong(0).toDouble
    if (nDocs == 0) return (_: Column) => lit(0.0) // no reference corpus yet
    val avgdl = st.getDouble(1)
    val dfMap: Map[String, Long] =
      qset.zipWithIndex.map { case (t, i) => t -> st.getLong(i + 2) }.toMap
    (text: Column) => {
      val ts = toks(text)
      val dl = size(ts).cast("double")
      val score = qset.map { t =>
        val df = dfMap.getOrElse(t, 0L).toDouble
        val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
        val tf = size(filter(ts, w => w === t)).cast("double")
        when(tf > 0,
          lit(idf) * (tf * lit(k1 + 1.0)) /
            (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl))))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
      round(score, 4)
    }
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher 2009): fuse the sparse [[bm25]] ranking with a dense
    * cosine ranking of the same corpus,
    * rrf(d) = Σ_rankings 1/(rrfK + rank_d) — the standard first-stage
    * retriever for RAG and quality-driven curation (lexical recall
    * catches exact terminology, semantic recall catches paraphrase;
    * the rank-space fusion needs no score calibration between the
    * two).
    *
    * Scale shape: each side reduces to its top-`poolK` candidates
    * through Spark's TakeOrdered (per-partition top-k then a
    * driver-side merge of K·partitions rows — NO global sort at any
    * corpus size); the dense side is one map-only projection with the
    * query vector as a broadcast literal; the rank windows and the
    * full-outer fuse then run over two ≤poolK-row frames, bounded by
    * construction. Both ranks order by the ROUNDED score (then id),
    * matching the oracle's tie-break exactly.
    */
  /** The map-only arrival-scoring stage shared by [[hybridRrfStream]]
    * (and plan-pinned in SearchSpec on a batch frame): per row, the
    * bm25Scorer score against the static reference statistics, a
    * does-any-query-term-match flag (the batch [[bm25]] ranks ONLY
    * matching docs, so a matching doc whose score rounds to 0.0 must
    * still enter the lexical pool), and the dense cosine against the
    * broadcast query vector. Join-free, state-free, zero exchanges.
    */
  private[graft] def hybridArrivalScores(arrivals: DataFrame,
                                         scorer: Column => Column,
                                         idCol: String, textCol: String,
                                         embCol: String, terms: Seq[String],
                                         queryVec: Seq[Float]): DataFrame = {
    val qset = typedlit(terms.map(_.toLowerCase).distinct)
    val qv = typedlit(queryVec).cast("array<float>")
    arrivals.select(
      col(idCol).cast("long").as("doc_id"),
      scorer(col(textCol)).as("bm25"),
      (size(array_intersect(toks(col(textCol)), qset)) > 0).as("hit"),
      round(Knn.cosine(col(embCol), qv), 5).as("cos"))
  }

  /** Generation counter + the two bounded score pools of
    * [[hybridRrfStream]]'s per-query state.
    */
  private[graft] case class HybridPools(gen: Long,
                                        lex: Seq[(Long, Double)],
                                        dense: Seq[(Long, Double)])

  /** Streaming twin of [[hybridRrf]] — the serving/indexing side of
    * RAG retrieval: documents (carrying their embeddings) ARRIVE as a
    * stream while the reciprocal-rank-fused top-k for a fixed query
    * is maintained incrementally; after every micro-batch the operator
    * emits the current ranking (tagged with a `gen` counter, so the
    * newest generation is the live result). With `refCorpus` equal to
    * the final arrival set, the last emission matches [[hybridRrf]]
    * row-for-row (StreamingSpec pins it per rank).
    *
    * Scale shape: scoring is the join-free [[hybridArrivalScores]]
    * projection — the corpus is NEVER shuffled; each partition then
    * pre-reduces to its local top-`poolK` per side through two bounded
    * heaps, so the single-group state regroup moves ≤ 2·poolK rows per
    * partition regardless of micro-batch size, and the driver state is
    * two poolK-bounded pools (corpus-size independent). Re-arrivals of
    * an id keep their best score.
    */
  def hybridRrfStream(arrivals: DataFrame, refCorpus: DataFrame,
                      idCol: String, textCol: String, embCol: String,
                      terms: Seq[String], queryVec: Seq[Float],
                      rrfK: Int = 60, poolK: Int = 100,
                      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(poolK > 0 && topK > 0 && rrfK >= 0, "hybridRrfStream: bad parameters")
    val session = arrivals.sparkSession
    import session.implicits._
    val scorer = bm25Scorer(refCorpus, textCol, terms)
    val scored = hybridArrivalScores(arrivals, scorer, idCol, textCol,
      embCol, terms, queryVec)
      .as[(Long, Double, Boolean, Double)]

    // partition-local bounded top-k (two heaps, worst-on-top): the
    // state regroup must not move a whole micro-batch
    val pruned = scored.mapPartitions {
      (it: Iterator[(Long, Double, Boolean, Double)]) =>
        // max of ((-score, id)) = the WORST row — dequeue evicts it
        def heap(by: ((Long, Double, Boolean, Double)) => Double) =
          scala.collection.mutable.PriorityQueue
            .empty[(Long, Double, Boolean, Double)](
              Ordering.by((r: (Long, Double, Boolean, Double)) => (-by(r), r._1)))
        val lexH = heap(_._2); val denseH = heap(_._4)
        it.foreach { r =>
          if (r._3) { lexH.enqueue(r); if (lexH.size > poolK) lexH.dequeue() }
          denseH.enqueue(r); if (denseH.size > poolK) denseH.dequeue()
        }
        (lexH.toSeq ++ denseH.toSeq).distinct.iterator
    }

    def topPool(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
      xs.groupBy(_._1).map { case (id, ss) => (id, ss.map(_._2).max) }.toSeq
        .sortBy { case (id, s) => (-s, id) }.take(poolK)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    pruned.groupByKey(_ => 0)
      .flatMapGroupsWithState[HybridPools,
        (Long, Long, Option[Int], Option[Int], Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (_, rows, state: GroupState[HybridPools]) =>
        val prev = state.getOption.getOrElse(HybridPools(0L, Nil, Nil))
        val batch = rows.toSeq
        val lex = topPool(prev.lex ++
          batch.collect { case (id, s, true, _) => (id, s) })
        val dense = topPool(prev.dense ++
          batch.map { case (id, _, _, c) => (id, c) })
        val gen = prev.gen + 1
        state.update(HybridPools(gen, lex, dense))
        val lexRank = lex.iterator.zipWithIndex
          .map { case ((id, _), i) => id -> (i + 1) }.toMap
        val denseRank = dense.iterator.zipWithIndex
          .map { case ((id, _), i) => id -> (i + 1) }.toMap
        (lexRank.keySet ++ denseRank.keySet).toSeq.map { id =>
          val lr = lexRank.get(id); val dr = denseRank.get(id)
          val rrf = round6(lr.map(r => 1.0 / (rrfK + r)).getOrElse(0.0) +
            dr.map(r => 1.0 / (rrfK + r)).getOrElse(0.0))
          (gen, id, lr, dr, rrf)
        }.sortBy { case (_, id, _, _, rrf) => (-rrf, id) }.take(topK).iterator
      }
      .toDF("gen", "doc_id", "lex_rank", "dense_rank", "rrf")
  }

  def hybridRrf(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String],
                embs: DataFrame, embIdCol: String, embCol: String,
                queryVec: Seq[Float], rrfK: Int = 60, poolK: Int = 100,
                topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(poolK > 0 && topK > 0 && rrfK >= 0, "hybridRrf: bad parameters")
    val lexPool = bm25(docs, idCol, textCol, terms)
      .select(col("doc_id"), col("bm25"))
      .orderBy(desc("bm25"), col("doc_id")).limit(poolK)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
    val qv = typedlit(queryVec).cast("array<float>")
    val densePool = embs
      .select(col(embIdCol).as("doc_id"),
        round(Knn.cosine(col(embCol), qv), 5).as("cos"))
      .orderBy(desc("cos"), col("doc_id")).limit(poolK)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(desc("cos"), col("doc_id"))))
    lexPool.select(col("doc_id"), col("lex_rank"))
      .join(densePool.select(col("doc_id"), col("dense_rank")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(desc("rrf"), col("doc_id")).limit(topK)
  }

  /** Retrieval-quality evaluation: per-query recall@k, MRR@k and
    * (binary-gain) nDCG@k of a ranked run against a relevance table —
    * the measurement half of the retrieval family (TREC-style; see
    * Manning et al., IIR ch. 8). `runs` holds (qid, doc, rank ≥ 1)
    * rows — e.g. [[hybridRrf]] or Knn top-k output — and `qrels` holds
    * (qid, doc) judged-relevant pairs.
    *
    * DCG discounts 1/log₂(rank+1) are computed ONCE on the driver and
    * inlined as a literal array into the plan — the DuckDB oracle
    * inlines the same doubles, so the replay is bit-identical without
    * trusting two engines' transcendental log to agree at the last
    * ulp. Queries with no judged-relevant docs report recall/mrr/ndcg
    * 0 (present in the output, not dropped).
    *
    * Scale shape: the run is already ≤k rows per query; qrels
    * aggregate to ONE row per query (n_rel + the capped ideal-DCG)
    * before the join, so both join sides are query-bounded — the
    * corpus never appears. Metric arithmetic is map-side; one
    * qid-keyed aggregation each for the run and the qrels.
    */
  def evalRetrieval(runs: DataFrame, qrels: DataFrame, k: Int,
                    qidCol: String = "qid", docCol: String = "doc_id",
                    rankCol: String = "rank"): DataFrame = {
    require(k > 0, "evalRetrieval: k must be positive")
    val disc: Seq[Double] =
      (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val discLit = typedlit(disc)
    val q = qrels.select(col(qidCol).as("qid"), col(docCol).as("doc_id"))
      .distinct()
    // one row per judged query: total relevant + ideal DCG (the best
    // k ranks filled with relevant docs)
    val perQrel = q.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_rel"))
      .withColumn("idcg", aggregate(
        slice(discLit, lit(1), least(col("n_rel"), lit(k)).cast("int")),
        lit(0.0), (acc, x) => acc + x))
    val hits = runs
      .select(col(qidCol).as("qid"), col(docCol).as("doc_id"),
        col(rankCol).cast("int").as("rank"))
      .where(col("rank") <= k)
      .join(q.withColumn("rel", lit(1)), Seq("qid", "doc_id"), "left")
      .groupBy(col("qid"))
      .agg(
        count(when(col("rel").isNotNull, 1)).as("hits"),
        min(when(col("rel").isNotNull, col("rank"))).as("first_rel"),
        sum(when(col("rel").isNotNull,
          element_at(discLit, col("rank"))).otherwise(lit(0.0))).as("dcg"))
    perQrel.join(hits, Seq("qid"), "full_outer")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(when(col("n_rel").isNull || col("n_rel") === 0, 0.0)
          .otherwise(coalesce(col("hits"), lit(0L)).cast("double") /
            col("n_rel").cast("double")), 6).as("recall"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
        round(when(col("idcg").isNull || col("idcg") === 0.0, 0.0)
          .otherwise(coalesce(col("dcg"), lit(0.0)) / col("idcg")), 6)
          .as("ndcg"))
  }
}
