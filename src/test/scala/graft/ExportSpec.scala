package graft

import graft.queries.ExportQueries

/** Export utilities: the epoch shuffle's global positions and the
  * weighted sample's selection must be bit-identical at any
  * parallelism — that's the whole point of hash-derived randomness
  * (resuming a 100 TB export re-samples nothing).
  */
class ExportSpec extends SparkSuite {

  private def withShufflePartitions[A](n: Int)(f: => A): A = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("epoch shuffle positions are identical across partition counts") {
    def run(): Map[Long, Long] =
      ExportQueries.qs("q_shuffle_epoch")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at2 = withShufflePartitions(2)(run())
    val at13 = withShufflePartitions(13)(run())
    assert(at2 === at13)
    // a permutation: every position 1..n exactly once
    assert(at2.values.toSeq.sorted === (1L to at2.size).toSeq)
  }

  test("epoch shuffles with different salts are different permutations") {
    val pos = ExportQueries.qs("q_shuffle_epoch")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identity ordering (doc_id rank) must not survive the shuffle
    val sortedIds = pos.keys.toSeq.sorted
    val identical = sortedIds.zipWithIndex.count { case (id, i) => pos(id) == i + 1 }
    assert(identical < sortedIds.size / 10, s"$identical docs kept their rank")
  }

  test("weighted sample is deterministic and weight-sensitive") {
    def run(): Set[(String, Long, Long)] =
      ExportQueries.qs("q_sample_weighted")(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a = withShufflePartitions(3)(run())
    val b = withShufflePartitions(17)(run())
    assert(a === b)
    // weight sensitivity: winners skew long — their mean length beats
    // the corpus mean (n_chars weighting)
    val docs = Tables(spark, sf, "documents")
    val winners = a.map(_._3)
    val all = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meanAll = all.values.sum.toDouble / all.size
    val meanWin = winners.map(all).sum.toDouble / winners.size
    assert(meanWin > meanAll, s"winners mean $meanWin not above corpus mean $meanAll")
  }
}
