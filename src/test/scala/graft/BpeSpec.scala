package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer/encoder contracts (SURVEY §2.9). */
class BpeSpec extends SparkSuite {

  test("trainer reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // corpus: "low" x3, "lower" x2  (the classic Sennrich example cut down)
    //   pair counts round 1: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=2
    //     -> argmax ties (l,o)/(o,w) at 5, lexicographic -> (l,o)
    //   round 2: (lo,w)=5 (w,e)=2 (e,r)=2 -> (lo,w)
    //   round 3: (low,e)=2 (e,r)=2 -> (e,r) since "er" < "low" on left
    //   round 4: (low,er)=2
    //   round 5: nothing occurs twice -> stop
    val docs = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val out = Bpe.train(docs, "text", numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0, "l", "o", 5L),
      (1, "lo", "w", 5L),
      (2, "e", "r", 2L),
      (3, "low", "er", 2L)))
  }

  test("merge replacement is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaa" x2: (a,a)=4 (two per word, left to right), merge -> "aa a"
    // round 2: (aa,a)=2 -> "aaa"; round 3: nothing repeats
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = Bpe.train(docs, "text", numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }

  test("encode replays trained merges and round-trips the characters") {
    import spark.implicits._
    val corpus = Seq((1L, "low low low lower lower widest")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = corpus.select(Bpe.encode(col("text"), merges).as("e"))
      .first().getSeq[String](0)
    // "low"/"lower" collapse to single tokens, unseen "widest" to chars
    assert(enc.take(5) == Seq("low", "low", "low", "lower", "lower"))
    assert(enc.drop(5) == Seq("w", "i", "d", "e", "s", "t"))
    assert(enc.mkString("") == "lowlowlowlowerlowerwidest",
      "subwords must concatenate back to the original characters")
  }

  test("maxVocab caps the working set; merges still train on the kept words") {
    import spark.implicits._
    val docs = Seq((1L, "zz zz zz qq qq unique")).toDF("doc_id", "text")
    val out = Bpe.train(docs, "text", numMerges = 10, maxVocab = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // only zz (3) and qq (2) survive the cap
    assert(out.toSeq == Seq(("z", "z", 3L), ("q", "q", 2L)))
  }

  test("trainer is deterministic on the real corpus") {
    val docs = Tables(spark, sf, "documents")
    val a = Bpe.train(docs, "text", numMerges = 8).collect().toSeq
    val b = Bpe.train(docs, "text", numMerges = 8).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size <= 8)
  }

  test("codegen encode kernel agrees with the regex-chain reference") {
    import spark.implicits._
    val merges = Seq(("t", "a"), ("l", "e"), ("ta", "b"), ("tab", "le"))
    val docs = Tables(spark, sf, "documents").select(col("text"))
      .unionByName(Seq(
        "tata tabtab cantata ukulele",       // adjacent pair runs
        "  leading   and \t trailing  ",      // whitespace shapes
        "TABLE TaBlE MiXeD",                  // case folding
        "aaa aaaa aaaaaa",                    // self-overlapping runs
        "").toDF("text"))
    val diff = docs.select(
      graft.functions.BpeFunctions.bpe_encode(col("text"), merges).as("k"),
      Bpe.encode(col("text"), merges).as("r"))
      .where(not(col("k") <=> col("r"))).count()
    assert(diff == 0, "kernel and regex-chain encode diverge")
    // and with the 'aa' merge family, where left-to-right order matters
    val m2 = Seq(("a", "a"), ("aa", "a"))
    val d2 = docs.select(
      graft.functions.BpeFunctions.bpe_encode(col("text"), m2).as("k"),
      Bpe.encode(col("text"), m2).as("r"))
      .where(not(col("k") <=> col("r"))).count()
    assert(d2 == 0)
  }

  test("encode kernel: property equivalence with the regex chain on random inputs") {
    // driver-side property check against the JVM kernel directly —
    // the regex reference below replays Bpe.encode's exact column
    // semantics (lowercase, \s+ tokenize, per-char split, padded
    // lookaround merges) with java.util.regex, the same engine
    // Spark's regexp_replace uses
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    def regexEncode(s: String, merges: Seq[(String, String)]): Seq[String] = {
      def q(x: String) = java.util.regex.Pattern.quote(x)
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { t =>
        var r = t.replaceAll("(?s)(?<=.)(?=.)", " ")
        merges.foreach { case (l, rr) =>
          r = r.replaceAll("(?<=^| )" + q(l) + " " + q(rr) + "(?=$| )",
            java.util.regex.Matcher.quoteReplacement(l + rr))
        }
        r.split(" ").toSeq
      }
    }
    val mergeSets = Gen.oneOf(
      Seq(("t", "a"), ("l", "e"), ("ta", "b"), ("tab", "le")),
      Seq(("a", "a"), ("aa", "a")),
      Seq(("$", "$"), (".", ".")),
      Seq(("a", "b"), ("ab", "a")))
    val text = Gen.listOf(Gen.oneOf("a", "b", "t", "l", "e", "ta", "aa",
      "$", ".", " ", "  ", "\t", "table", "tata", "aaa")).map(_.mkString)
    val prop = Prop.forAll(text, mergeSets) { (s, ms) =>
      val flat = ms.flatMap { case (l, r) => Seq(l, r) }.toArray
      val kernel = graft.functions.BpeRuntime.encode(s, flat)
        .array.map(_.toString).toSeq
      kernel == regexEncode(s, ms)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("regex-special symbols survive merging and encoding") {
    import spark.implicits._
    // words of regex metacharacters: merges like (.,.) and ($,$) must
    // be quoted in the pattern and escaped in the replacement
    val docs = Seq((1L, ".. .. $$ $$")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("$", "$"), (".", "."))) // '$' < '.' on the tie
    val enc = docs.select(Bpe.encode(col("text"), merges).as("e"))
      .first().getSeq[String](0)
    assert(enc == Seq("..", "..", "$$", "$$"))
  }
}
