package graft

import org.apache.spark.sql.functions._
import graft.functions.AcAutomaton
import graft.operators.TextOps

/** Aho-Corasick keyword tagging: the classic ushers fixture, overlap
  * counting, case folding, a 500-pattern randomized cross-check vs
  * naive substring counting, and the codegen Column/SQL paths.
  */
class AhoCorasickSpec extends SparkSuite {
  import spark.implicits._

  test("classic fixture: {he, she, his, hers} over 'ushers'") {
    val ac = new AcAutomaton(Seq("he", "she", "his", "hers"))
    val (total, matched) = ac.tag("ushers")
    assert(total == 3L) // she@1, he@2, hers@2
    assert(matched.toSeq == Seq("he", "hers", "she"))
    val counts = ac.countsOf("ushers")
    val byPat = ac.patterns.zip(counts).toMap
    assert(byPat == Map("he" -> 1L, "hers" -> 1L, "his" -> 0L, "she" -> 1L))
  }

  test("overlapping occurrences all count; matching is case-insensitive") {
    val ac = new AcAutomaton(Seq("aa"))
    assert(ac.tag("aaaa")._1 == 3L)
    val ac2 = new AcAutomaton(Seq("Spark"))
    assert(ac2.tag("SPARK spark sPaRk")._1 == 3L)
  }

  test("500-pattern automaton agrees with naive substring counting") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    val pats = (1 to 500).map { _ =>
      (1 to (2 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(4))).mkString
    }.distinct
    val ac = new AcAutomaton(pats)
    val text = (1 to 2000).map(_ => alphabet(rnd.nextInt(4))).mkString
    val counts = ac.countsOf(text)
    ac.patterns.zip(counts).foreach { case (p, c) =>
      // naive overlap-inclusive count
      var n = 0L
      var i = text.indexOf(p)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) }
      assert(c == n, s"pattern $p: ac $c vs naive $n")
    }
  }

  test("column path is a map-only codegen projection; SQL name matches") {
    val docs = Tables(spark, sf, "documents").limit(50)
    val pats = Seq("hash", "join", "spark")
    val viaCol = docs.select(col("doc_id"),
      TextOps.keywordTag(col("text"), pats).as("t"))
    val plan = viaCol.queryExecution.executedPlan.toString
    assert(plan.contains("keyword_tag") && !plan.contains("Exchange"))
    graft.functions.GraftFunctions.registerAll(spark)
    docs.createOrReplaceTempView("docs_ac")
    val viaSql = spark.sql(
      "SELECT doc_id, keyword_tag(text, 'hash;join;spark') AS t FROM docs_ac")
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // non-literal pattern list is rejected at plan time
    intercept[Exception](
      spark.sql("SELECT keyword_tag(text, text) FROM docs_ac").collect())
  }

  test("pattern folding is locale-independent (Turkish dotless-i regression)") {
    // regression: locale-default String.toLowerCase on a Turkish JVM
    // folds 'I'→'ı' on the pattern side only, so uppercase-I patterns
    // would never match; per-char Character.toLowerCase is stable
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      val ac = new AcAutomaton(Seq("HIGH RISK", "III"))
      assert(ac.tag("a high risk clause, title iii")._1 == 2L)
      assert(ac.patterns.toSeq == Seq("high risk", "iii"))
    } finally java.util.Locale.setDefault(prev)
  }
}
