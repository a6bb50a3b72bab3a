package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016) over
  * the corpus — the tokenizer-construction step of a pre-training
  * pipeline.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is
  * touched EXACTLY ONCE, by the word-count aggregation (map-side
  * partial agg, one shuffle keyed on the word). The merge loop then
  * runs on the top-`maxVocab` (word, count) table — 50k words ≈ ½ MB,
  * bounded by the caller's constant regardless of corpus size — on
  * the driver, the same documented bounded-collect pattern as the IVF
  * centroid pull, and the design every production trainer uses (rare
  * words can't influence merges, so the cap loses nothing). A
  * distributed merge loop would be strictly worse: 30k merges × a
  * cluster job each, all over data that fits in one task.
  */
object Bpe {

  /** The one corpus pass: whitespace word counts, top `maxVocab` by
    * frequency (ties broken by word, so training is deterministic).
    */
  def wordVocab(docs: DataFrame, textCol: String, maxVocab: Int): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)

  /** Train up to `numMerges` merge rules; stops early when no symbol
    * pair occurs twice. Returns the rules in rank order:
    * (rank, left, right, pair_count). Argmax ties break on
    * (left, right) ascending so the merge table is reproducible.
    *
    * The loop recounts every pair per iteration — O(numMerges ×
    * Σ word lengths), exact and plenty for vocabulary-building runs
    * in the hundreds of merges. A 30k-merge production run should
    * switch the inner loop to Sennrich's incremental bookkeeping
    * (update only the pair counts adjacent to the positions a merge
    * touched); the corpus-side cost — the one that scales with data
    * size — is identical either way.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    // bounded by maxVocab — see the scale note in the object doc
    val words: Array[(Array[String], Long)] =
      wordVocab(docs, textCol, maxVocab).collect()
        .map(r => r.getString(0).split("").filter(_.nonEmpty) -> r.getLong(1))
    val reprs = words.map(_._1.clone())
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for (i <- words.indices; s = reprs(i); cnt = words(i)._2;
           j <- 0 until s.length - 1) {
        counts.updateWith((s(j), s(j + 1)))(c => Some(c.getOrElse(0L) + cnt))
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        // argmax by count, ties by (left, right) ascending
        val ((l, r), c) = best.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, c))
        // left-to-right non-overlapping replacement in every word
        for (i <- reprs.indices) {
          val s = reprs(i)
          if (s.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
                out += l + r; j += 2
              } else { out += s(j); j += 1 }
            }
            reprs(i) = out.toArray
          }
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right", "pair_count")
  }

  /** One merge as a left-to-right non-overlapping replacement of the
    * symbol bigram "l r" by "lr" in a space-joined representation —
    * Java's regexp_replace consumes matches left to right and the
    * boundary lookarounds don't consume the delimiting spaces, so
    * this replays exactly the trainer's sequential-scan semantics.
    */
  private def mergePattern(l: String, r: String): String =
    "(?<=^| )" + java.util.regex.Pattern.quote(l) + " " +
      java.util.regex.Pattern.quote(r) + "(?=$| )"

  private def mergeReplacement(l: String, r: String): String =
    (l + r).replace("\\", "\\\\").replace("$", "\\$")

  /** Encode text with a trained merge list: split each word into
    * character symbols, replay the merges in rank order, return the
    * flat subword-token array. One codegen projection (a fixed chain
    * of regexp_replace calls over the space-joined symbols) —
    * map-only, streams and batches alike.
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val word = (c: Column) => merges.foldLeft(
      // "hello" -> "h e l l o": a space at every intra-word boundary.
      // (?s) so '.' also matches line terminators (U+2028 etc.) that
      // \s+ tokenization keeps inside a token — the trainer's
      // split("") sees those as symbols, so the encoder must too.
      regexp_replace(c, "(?s)(?<=.)(?=.)", " ")) { case (acc, (l, r)) =>
      regexp_replace(acc, mergePattern(l, r), mergeReplacement(l, r))
    }
    flatten(transform(TextOps.tokens(text), t => split(word(t), " ")))
  }
}
