package graft.functions

/** Tight-loop text hashing kernels behind the custom Catalyst
  * expressions (MinHashSigExpr, SimHash64Expr, ShingleHashesExpr,
  * FingerprintExpr). One pass over the document, primitive arrays, no
  * boxing — these replace nested higher-order-function pipelines that
  * were interpreted per element (round-2 bench: 688 s for minhash at
  * sf0.1; these kernels bring the same computation to ~seconds).
  *
  * Called from generated Java code (whole-stage codegen), so every
  * method must stay a static-forwardable pure function.
  *
  * Reference semantics: SURVEY §2.9 dedup operators (beyond
  * lf-edge/ekuiper's own surface).
  */
object TextHashing {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit hashes of lower-cased whitespace-delimited tokens, in
    * document order. FNV-1a over chars, then mixed.
    */
  def tokenHashes(text: String): Array[Long] = {
    val len = text.length
    val out = new java.util.ArrayList[java.lang.Long](math.max(8, len / 6))
    var i = 0
    var h = 0xCBF29CE484222325L
    var inTok = false
    while (i < len) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) {
        if (inTok) { out.add(mix64(h)); h = 0xCBF29CE484222325L; inTok = false }
      } else {
        val lc = Character.toLowerCase(c)
        h = (h ^ lc) * 0x100000001B3L
        inTok = true
      }
      i += 1
    }
    if (inTok) out.add(mix64(h))
    val res = new Array[Long](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    res
  }

  /** Lower-cased whitespace tokens as strings — the string-valued twin
    * of [[tokenHashes]] (same per-char lowercasing and boundaries), for
    * kernels that need the token text rather than its hash.
    */
  def tokensOf(text: String): Array[String] = {
    val len = text.length
    val out = new java.util.ArrayList[String](math.max(8, len / 6))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) { out.add(sb.toString); sb.setLength(0) }
      } else sb.append(Character.toLowerCase(c))
      i += 1
    }
    if (sb.length > 0) out.add(sb.toString)
    out.toArray(new Array[String](out.size))
  }

  /** Distinct (sorted) 64-bit hashes of word n-gram shingles. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenHashes(text)
    if (toks.length < n) return Array.emptyLongArray
    val m = toks.length - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < n) { h = mix64(h ^ toks(i + j)); j += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == m) hs else java.util.Arrays.copyOf(hs, w)
  }

  private val maxSeeds = 512
  /** Fixed per-position seeds for the k min-hash functions. */
  private val seeds: Array[Long] = {
    val a = new Array[Long](maxSeeds)
    var i = 0
    while (i < maxSeeds) { a(i) = mix64(0x5DEECE66DL + i * 0x2545F4914F6CDD1DL); i += 1 }
    a
  }

  /** k-element MinHash signature: position i holds
    * min over shingles s of mix64(s ^ seed_i); Long.MaxValue when the
    * document has no shingles (mirrors the identity of `least`).
    */
  def minhashSig(text: String, n: Int, k: Int): Array[Long] = {
    require(k <= maxSeeds, s"k must be <= $maxSeeds")
    val sh = shingleHashes(text, n)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < k) {
      val seed = seeds(i)
      var best = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val v = mix64(sh(j) ^ seed)
        if (v < best) best = v
        j += 1
      }
      sig(i) = best
      i += 1
    }
    sig
  }

  // ---- portable (oracle-replayable) MinHash ----------------------
  // The splitmix64 family above is the fast path; this family trades a
  // little speed for EXACT SQL replayability: shingle hash = the first
  // 60 bits of md5(shingle string) reduced mod P, permuted by k LCGs
  // (aᵢ·h + bᵢ) mod P with P = 2³¹−1 — every step is md5 + BIGINT
  // arithmetic that DuckDB evaluates bit-identically, so minhash LSH
  // queries built on it carry a FULL DuckDB oracle instead of a
  // rows-only golden.

  /** Modulus of the portable LCG hash family (2³¹−1, Mersenne prime —
    * products a·h stay under 2⁶² so both JVM Long and DuckDB BIGINT
    * arithmetic are exact with no overflow).
    */
  val portableP: Long = 2147483647L

  /** Deterministic LCG coefficients (aᵢ ∈ [1, P−1], bᵢ ∈ [0, P−1]);
    * the oracle SQL inlines exactly these values as a VALUES table.
    */
  def portableSeeds(k: Int): IndexedSeq[(Long, Long)] = {
    require(k <= maxSeeds, s"k must be <= $maxSeeds")
    (0 until k).map { i =>
      val a = (mix64(0xA5EED0L + i) & Long.MaxValue) % (portableP - 1) + 1
      val b = (mix64(0xB5EED0L + i) & Long.MaxValue) % portableP
      (a, b)
    }
  }
  private val portableA: Array[Long] = portableSeeds(maxSeeds).map(_._1).toArray
  private val portableB: Array[Long] = portableSeeds(maxSeeds).map(_._2).toArray

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s) reduced mod P — the base hash h₀ the
    * whole portable family permutes. DuckDB replay:
    * ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647.
    */
  @inline private def md5Base(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    val h0 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
    h0 % portableP
  }

  /** Portable base hashes of the word n-gram shingles (non-distinct,
    * document order): h₀ of each space-joined lower-cased shingle.
    * Empty when the document has fewer than n tokens.
    */
  def portableShingleBases(text: String, n: Int): Array[Long] = {
    val toks = tokensOf(text)
    if (toks.length < n) return Array.emptyLongArray
    val m = toks.length - n + 1
    val md = md5Local.get()
    val bases = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      bases(i) = md5Base(md, sb.toString)
      i += 1
    }
    bases
  }

  /** k-element portable MinHash signature: position i holds
    * min over shingles s of (aᵢ·h₀(s) + bᵢ) mod P where h₀ = the first
    * 15 hex chars of md5(s) mod P; all-Long.MaxValue sentinel when the
    * document has fewer than n tokens (mirrors [[minhashSig]]).
    */
  def portableMinhashSig(text: String, n: Int, k: Int): Array[Long] = {
    require(k <= maxSeeds, s"k must be <= $maxSeeds")
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val bases = portableShingleBases(text, n)
    if (bases.isEmpty) return sig
    val m = bases.length
    var s = 0
    while (s < k) {
      val a = portableA(s); val b = portableB(s)
      var best = Long.MaxValue
      var t = 0
      while (t < m) {
        val v = (a * bases(t) + b) % portableP
        if (v < best) best = v
        t += 1
      }
      sig(s) = best
      s += 1
    }
    sig
  }

  /** 64-bit SimHash over (all, non-distinct) token hashes: bit i of the
    * result is set iff Σ_tokens (bit i set ? +1 : -1) > 0.
    */
  def simhash64(text: String): Long = {
    val toks = tokenHashes(text)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = toks(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** [[simhash64]]'s oracle-replayable twin: token hash = the first 16
    * hex chars of md5(token) read as an unsigned 64-bit value (DuckDB:
    * ('0x' || substr(md5(t), 1, 16))::UBIGINT), sign-summed per bit
    * over the NON-distinct token stream, bit set iff the sum is
    * strictly positive. Zero-token documents hash to 0 — callers that
    * pair on the signature must exclude them (a shared all-zeros
    * bucket is both semantically wrong and a scale hazard).
    */
  def portableSimhash64(text: String): Long = {
    val toks = tokensOf(text)
    if (toks.isEmpty) return 0L
    val counts = new Array[Int](64)
    val md = md5Local.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Language-ID stopword tables: token hashes of each language's top
    * function words (must stay in sync with
    * graft.operators.TextOps.stopwords — DedupSpec pins equivalence).
    */
  private[functions] val langTables: Array[(String, Array[Long])] =
    Array(
      "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "im"),
      "en" -> Array("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
      "es" -> Array("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
      "fr" -> Array("le", "la", "de", "et", "est", "un", "une", "les", "dans", "que"),
      "zh" -> Array("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))
      .map { case (lang, words) =>
        lang -> words.map(w => tokenHashes(w)(0)).sorted
      }

  /** One-pass language ID: tokenize once, count stopword hits per
    * language (binary search in the per-language hash table), return
    * the best-ratio language or "und" when nothing matches. Same
    * argmax/tie-break as the HOF reference in TextOps.langId (ties go
    * to the lexicographically greater language, mirroring Spark's
    * struct max over (score, lang)).
    */
  def langId(text: String): String = {
    val toks = tokenHashes(text)
    if (toks.isEmpty) return "und"
    val hits = new Array[Int](langTables.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < langTables.length) {
        if (java.util.Arrays.binarySearch(langTables(l)._2, toks(t)) >= 0) hits(l) += 1
        l += 1
      }
      t += 1
    }
    var best = -1
    var l = 0
    while (l < langTables.length) {
      // >= : later (lexicographically greater) language wins ties
      if (hits(l) > 0 && (best < 0 || hits(l) >= hits(best))) best = l
      l += 1
    }
    if (best < 0) "und" else langTables(best)._1
  }

  /** Document fingerprint: minimum shingle hash (min-sampling / MOD-0
    * winnowing degenerate); whole-text hash when the document is
    * shorter than one shingle.
    */
  def fingerprintMin(text: String, n: Int): Long = {
    val sh = shingleHashes(text, n)
    if (sh.isEmpty) {
      var h = 0xCBF29CE484222325L
      var i = 0
      while (i < text.length) { h = (h ^ text.charAt(i)) * 0x100000001B3L; i += 1 }
      mix64(h)
    } else sh(0) // sorted ascending — head is the minimum
  }

  /** [[fingerprintMin]]'s oracle-replayable twin: minimum portable
    * shingle base hash (min-sampling over md5-derived h₀ values);
    * h₀ of the RAW text when the document is shorter than one shingle.
    * DuckDB replay: coalesce(min per-shingle, whole-text fallback) —
    * every step is md5 + BIGINT arithmetic.
    */
  def portableFingerprintMin(text: String, n: Int): Long = {
    val bases = portableShingleBases(text, n)
    if (bases.isEmpty) return md5Base(md5Local.get(), text)
    var best = Long.MaxValue
    var i = 0
    while (i < bases.length) { if (bases(i) < best) best = bases(i); i += 1 }
    best
  }

  /** Parse the 8 hex chars at 1-based byte offset `pos` of `s` into a
    * long — value-identical to SQL `conv(substring(s, pos, 8), 16, 10)`
    * on hex input, minus conv's per-call string slicing and generic
    * base conversion (the q_sketch_cms hot spot: conv was +0.9 s over
    * the md5 itself at sf0.1). Reads the UTF8String bytes in place;
    * tolerates uppercase and inputs shorter than pos+7 (parses what is
    * there, conv's behavior) — EXCEPT a slice starting entirely past
    * the end of the string: this returns 0L where conv(substring)
    * returns NULL (conv of ''). Every call site feeds 32-char md5 hex
    * with pos ≤ 25, so that case is unreachable there, but a new
    * caller must not rely on NULL propagation (divergence pinned in
    * SketchSpec). Second caveat: `pos` here indexes BYTES while
    * substring(s, pos, 8) indexes CHARACTERS — identical only while
    * everything before the slice is ASCII (true for hex digests; a
    * caller feeding arbitrary text with non-ASCII prefixes would
    * diverge from the SQL form).
    */
  def hexSliceToLong(s: org.apache.spark.unsafe.types.UTF8String, pos: Int): Long = {
    var v = 0L
    var i = pos - 1
    val end = math.min(pos + 7, s.numBytes())
    while (i < end) {
      val b = s.getByte(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return v // non-hex terminates the parse, like conv
      v = (v << 4) | d
      i += 1
    }
    v
  }
}
