package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramFunctions, UnigramKernels}

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model), the standard
  * alternative to BPE for LLM tokenizers. Viterbi-EM variant: the
  * E-step counts pieces along each word's single best segmentation
  * (hard EM — a recognized simplification of the forward-backward
  * E-step that keeps every count an INTEGER, which is what makes the
  * distributed reduction bit-deterministic: freq-weighted long sums
  * are order-independent, unlike floating expectations).
  *
  * Distribution shape per iteration — the classifier's layout:
  *  - the piece table (≤ seed size entries) broadcasts OUT inside a
  *    codegen segmentation kernel;
  *  - each partition returns (piece, long count) partials that one
  *    partial-agg'd shuffle reduces; the driver sees vocab-sized
  *    counts only.
  * The word list itself is the corpus's DISTINCT (word, freq) table —
  * one corpus pass; at 100 TB this is the standard
  * sample-then-train-tokenizer shape (SentencePiece itself trains on
  * a corpus sample), and the EM passes run over the bounded word
  * table, never the corpus.
  *
  * Pruning: after each EM round the lowest-count non-character pieces
  * are dropped (`shrinkFactor` per round), and a final prune truncates
  * to exactly `vocabSize`; single characters are never pruned, so
  * segmentation stays total (the returned size exceeds `vocabSize`
  * only when the alphabet alone does).
  */
object UnigramLm {

  final case class UnigramModel(logp: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int) {
    def pieces: Seq[(String, Double)] = {
      import scala.jdk.CollectionConverters._
      logp.asScala.toSeq.map { case (k, v) => (k, v.doubleValue()) }.sortBy(_._1)
    }
  }

  /** Distinct lower-cased (word, freq) table of a text column. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Train a unigram-LM vocabulary of `vocabSize` pieces. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 4000, iters: Int = 4,
      shrinkFactor: Double = 0.75): UnigramModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordsDf = wordTable(docs, textCol).repartition(
      math.max(1, spark.sparkContext.defaultParallelism / 2)).cache()
    try {
      require(!wordsDf.isEmpty, "unigram training needs a non-empty corpus")
      // ---- seed, DISTRIBUTED: substrings explode corpus-side, the
      // freq-weighted candidate counts aggregate through one shuffle,
      // and only the seed-sized top slice (plus the alphabet) ever
      // reaches the driver — the word table itself never collects
      val subDf = wordsDf.select(
          explode(graft.functions.UnigramFunctions.substrings_upto(
            col("w"), maxPieceLen)).as("p"), col("freq"))
        .groupBy(col("p")).agg(sum(col("freq")).as("c"))
      val top = subDf.orderBy(col("c").desc, col("p"))
        .limit(math.max(seedSize, 16))
        .as[(String, Long)].collect()
      val charRows = subDf.where(length(col("p")) === 1)
        .as[(String, Long)].collect()
      val chars = charRows.map(_._1).toSet
      var counts: Map[String, Long] = (top ++ charRows).toMap

      def toLogp(cs: Map[String, Long]): java.util.HashMap[String, java.lang.Double] = {
        val total = math.max(1L, cs.values.sum).toDouble
        val m = new java.util.HashMap[String, java.lang.Double](cs.size * 2)
        cs.foreach { case (p, c) =>
          m.put(p, math.log(math.max(c, 1L) / total))
        }
        m
      }

      var vocabNow = toLogp(counts)
      var iter = 0
      while (iter < iters) {
        // E-step: freq-weighted Viterbi piece counts — long sums, so
        // the aggregation is deterministic at any layout
        val eCounts = wordsDf
          .select(explode(UnigramFunctions.unigram_encode(col("w"), vocabNow,
            maxPieceLen)).as("piece"), col("freq"))
          .groupBy(col("piece")).agg(sum(col("freq")).as("c"))
          .as[(String, Long)].collect().toMap
        // M-step + prune: drop lowest-count multi-char pieces
        val target = math.max(vocabSize,
          (eCounts.size * shrinkFactor).toInt)
        val kept = eCounts.toSeq
          .sortBy { case (p, c) => (-c, p) }
          .iterator.zipWithIndex
          .collect { case ((p, c), i) if i < target || p.length == 1 => (p, c) }
          .toMap
        // characters that fell out of use keep a floor count so
        // segmentation stays total
        val withChars = chars.foldLeft(kept) { (m, ch) =>
          if (m.contains(ch)) m else m + (ch -> 1L)
        }
        counts = withChars
        vocabNow = toLogp(counts)
        iter += 1
      }
      // final prune to exactly vocabSize: the alphabet is reserved
      // FIRST (single characters are never pruned, so segmentation
      // stays total), then the remaining vocabSize − |alphabet| slots
      // fill with the top-count multi-char pieces — so the returned
      // size exceeds vocabSize only when the alphabet alone does
      if (counts.size > vocabSize) {
        val charPieces = chars.foldLeft(
            counts.filter { case (p, _) => p.length == 1 }) { (m, ch) =>
          if (m.contains(ch)) m else m + (ch -> 1L)
        }
        val slots = math.max(0, vocabSize - charPieces.size)
        val multi = counts.toSeq
          .filter { case (p, _) => p.length > 1 }
          .sortBy { case (p, c) => (-c, p) }
          .take(slots)
        counts = charPieces ++ multi
        vocabNow = toLogp(counts)
      }
      UnigramModel(vocabNow, maxPieceLen)
    } finally wordsDf.unpersist(blocking = false)
  }

  /** Persist a trained vocabulary as parquet (piece, logp) — the
    * train-once/encode-many contract shared with the ANN index and
    * classifier-weight persistence.
    */
  def save(spark: org.apache.spark.sql.SparkSession,
           model: UnigramModel, path: String): Unit = {
    import spark.implicits._
    (("", model.maxPieceLen.toDouble) +: model.pieces) // row 0 carries maxLen
      .toDF("piece", "logp")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a saved vocabulary. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): UnigramModel = {
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val maxLen = rows.collectFirst { case ("", v) => v.toInt }
      .getOrElse(throw new IllegalArgumentException(s"no header row in $path"))
    val m = new java.util.HashMap[String, java.lang.Double]()
    rows.foreach { case (p, lp) => if (p.nonEmpty) m.put(p, lp) }
    UnigramModel(m, maxLen)
  }

  /** Encode a text column with a trained model (codegen, map-only). */
  def encode(text: Column, model: UnigramModel): Column =
    UnigramFunctions.unigram_encode(text, model.logp, model.maxPieceLen)

  /** −Σ log p(piece) per document over the Viterbi encode — the "how
    * well does the tokenizer fit this text" description length.
    */
  def scoreBits(text: Column, model: UnigramModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.UnigramScoreExpr(
      ColumnBridge.expression(text), model.logp, model.maxPieceLen))
  }
}
