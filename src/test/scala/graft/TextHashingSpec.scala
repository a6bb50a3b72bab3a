package graft

import graft.functions.TextHashing
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the text-hashing kernels backing the custom Catalyst
  * expressions (no Spark needed — pure functions).
  */
class TextHashingSpec extends AnyFunSuite {

  test("tokenHashes: case-insensitive, whitespace-delimited, order-preserving") {
    val a = TextHashing.tokenHashes("The quick  brown\tfox\n")
    val b = TextHashing.tokenHashes("the QUICK brown fox")
    assert(a.length == 4)
    assert(a.toSeq == b.toSeq)
    assert(TextHashing.tokenHashes("").isEmpty)
    assert(TextHashing.tokenHashes("   \t\n ").isEmpty)
  }

  test("tokenHashes: distinct tokens hash differently") {
    val hs = TextHashing.tokenHashes("alpha beta gamma delta")
    assert(hs.distinct.length == 4)
  }

  test("shingleHashes: distinct sorted n-gram hashes; short docs empty") {
    val hs = TextHashing.shingleHashes("a b c d", 3) // shingles: abc, bcd
    assert(hs.length == 2)
    assert(hs.toSeq == hs.sorted.toSeq)
    assert(TextHashing.shingleHashes("a b", 3).isEmpty)
    // repeated shingles dedup: "a b a b a b" 2-grams = {ab, ba}
    assert(TextHashing.shingleHashes("a b a b a b", 2).length == 2)
  }

  test("shingle order matters") {
    val x = TextHashing.shingleHashes("a b c", 3)
    val y = TextHashing.shingleHashes("c b a", 3)
    assert(x.toSeq != y.toSeq)
  }

  test("minhashSig: deterministic, identical docs agree, disjoint docs disagree") {
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val s1 = TextHashing.minhashSig(doc, 3, 64)
    val s2 = TextHashing.minhashSig(doc, 3, 64)
    assert(s1.length == 64)
    assert(s1.toSeq == s2.toSeq)
    val other = TextHashing.minhashSig("completely different words describing other topics entirely here now", 3, 64)
    assert(s1.zip(other).count { case (x, y) => x == y } < 8)
    // empty doc → identity signature
    assert(TextHashing.minhashSig("", 3, 16).forall(_ == Long.MaxValue))
  }

  test("minhashSig agreement estimates Jaccard for overlapping docs") {
    // two docs sharing most of their shingles → most positions agree
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val near = (1 to 47).map(i => s"tok$i").mkString(" ") + " x y z"
    val a = TextHashing.minhashSig(base, 3, 256)
    val b = TextHashing.minhashSig(near, 3, 256)
    val agree = a.zip(b).count { case (x, y) => x == y }.toDouble / 256
    // true shingle Jaccard here is ~0.85; the estimate should land near it
    assert(agree > 0.6 && agree < 1.0, s"agreement $agree out of range")
  }

  test("simhash64: near-dup small hamming, different docs large hamming") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base + " tail"
    val far = (100 to 160).map(i => s"other$i").mkString(" ")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hBase = TextHashing.simhash64(base)
    assert(hBase == TextHashing.simhash64(base))
    assert(ham(hBase, TextHashing.simhash64(near)) <= 6)
    assert(ham(hBase, TextHashing.simhash64(far)) >= 20)
  }

  test("fingerprintMin: deterministic; equals min shingle hash; text fallback") {
    val doc = "one two three four five six seven"
    val fp = TextHashing.fingerprintMin(doc, 5)
    assert(fp == TextHashing.shingleHashes(doc, 5).min)
    // shorter than one shingle → whole-text hash, still deterministic
    val short = TextHashing.fingerprintMin("one two", 5)
    assert(short == TextHashing.fingerprintMin("one two", 5))
    assert(short != TextHashing.fingerprintMin("one three", 5))
  }

  test("portableFingerprintMin: min of portable shingle bases; md5 text fallback") {
    val doc = "one two three four five six seven"
    val fp = TextHashing.portableFingerprintMin(doc, 5)
    assert(fp == TextHashing.portableShingleBases(doc, 5).min)
    assert(fp >= 0 && fp < TextHashing.portableP)
    // shorter than one shingle → md5 of the raw text, deterministic
    val short = TextHashing.portableFingerprintMin("one two", 5)
    assert(short == TextHashing.portableFingerprintMin("one two", 5))
    assert(short != TextHashing.portableFingerprintMin("one three", 5))
    assert(short >= 0 && short < TextHashing.portableP)
  }

  test("portableShingleBases: document order, non-distinct, matches minhash front half") {
    val doc = "a b c a b c a b c"
    val bases = TextHashing.portableShingleBases(doc, 3)
    assert(bases.length == 7) // 9 tokens → 7 trigram shingles, repeats kept
    assert(bases(0) == bases(3) && bases(0) == bases(6)) // 'a b c' repeats
    // the minhash signature is reproduced by permuting these bases
    val sig = TextHashing.portableMinhashSig(doc, 3, 8)
    val seeds = TextHashing.portableSeeds(8)
    for (i <- 0 until 8) {
      val (a, b) = seeds(i)
      val want = bases.map(h => (a * h + b) % TextHashing.portableP).min
      assert(sig(i) == want, s"position $i")
    }
  }

  test("portable kernel properties: md5 cross-check, invariances, superset monotonicity") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val word = Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, Gen.alphaNumChar).map(_.mkString))
    val doc = Gen.choose(0, 30).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val md = java.security.MessageDigest.getInstance("MD5")
    // independent reimplementation of the base hash: parse the first 15
    // md5 hex chars as a number instead of the kernel's byte twiddling
    def refBase(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.take(15), 16) % TextHashing.portableP).toLong
    }
    val prop = Prop.forAll(doc, word) { (text, extra) =>
      val toks = TextHashing.tokensOf(text)
      val bases = TextHashing.portableShingleBases(text, 3)
      val refOk = bases.sameElements(
        (0 until math.max(0, toks.length - 2))
          .map(i => refBase(toks.slice(i, i + 3).mkString(" "))))
      val rangeOk = bases.forall(b => b >= 0 && b < TextHashing.portableP)
      // tokenization invariances hold once the doc has a real shingle
      // (below that the whole-text fallback hashes the raw string)
      val invOk = toks.length < 3 || {
        val mangled = "  " + text.replace(" ", " \t ") + "\n"
        TextHashing.portableFingerprintMin(mangled, 3) ==
          TextHashing.portableFingerprintMin(text, 3) &&
        TextHashing.portableFingerprintMin(text.toUpperCase, 3) ==
          TextHashing.portableFingerprintMin(text, 3)
      }
      // appending text only ADDS shingles: every signature position is
      // a min, so it can only decrease or stay
      val before = TextHashing.portableMinhashSig(text, 3, 16)
      val after = TextHashing.portableMinhashSig(text + " " + extra + " " + extra, 3, 16)
      val monoOk = before.zip(after).forall { case (b, a) => a <= b }
      refOk && rangeOk && invOk && monoOk
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("langId kernel: obvious languages, und fallback") {
    assert(TextHashing.langId("the cat sat on the mat and it is that") == "en")
    assert(TextHashing.langId("el que la y en un es por los") == "es")
    assert(TextHashing.langId("der und die das ist nicht ein") == "de")
    assert(TextHashing.langId("le chat est dans la maison et les autres") == "fr")
    assert(TextHashing.langId("zzz qqq xxx") == "und")
    assert(TextHashing.langId("") == "und")
  }

  test("mix64 avalanche: single-bit input flips ~half the output bits") {
    val h0 = TextHashing.mix64(0x1234L)
    val h1 = TextHashing.mix64(0x1235L)
    val flipped = java.lang.Long.bitCount(h0 ^ h1)
    assert(flipped >= 16 && flipped <= 48)
  }
}
