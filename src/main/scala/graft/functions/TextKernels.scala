package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Per-row text kernels backing the dedup / text-analysis expressions.
  * Called both from interpreted `eval` and from generated code.
  *
  * All hashes are splitmix64-style mixes — deterministic across JVMs and
  * runs (no System.identityHashCode / currentTimeMillis anywhere; the
  * reference seeds samplers with wall-clock time, flagged in SURVEY.md
  * §7.2 as a rebuild fix).
  */
object TextKernels {

  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Whitespace tokenizer (matches `\s+` split of trimmed text). */
  def tokenize(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  private def tokenHashes(s: String): Array[Long] = {
    val toks = tokenize(s)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      var h = 0x9E3779B97F4A7C15L
      val tok = toks(i)
      var j = 0
      while (j < tok.length) { h = mix64(h ^ tok.charAt(j).toLong); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Hashes of all n-token shingles (n-grams over the token stream). A
    * document shorter than n tokens yields its single whole-text shingle. */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val th = tokenHashes(s)
    if (th.isEmpty) return Array.empty
    if (th.length < n) {
      var h = 0x51_7C_C1_B7_27_22_0A_95L
      var i = 0
      while (i < th.length) { h = mix64(h ^ th(i)); i += 1 }
      return Array(h)
    }
    val out = new Array[Long](th.length - n + 1)
    var i = 0
    while (i + n <= th.length) {
      var h = 0x51_7C_C1_B7_27_22_0A_95L
      var j = i
      while (j < i + n) { h = mix64(h ^ th(j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash signature over n-token shingles: numHashes independent
    * permutations simulated by per-slot remixing (standard one-pass
    * minwise scheme). Empty text -> all Long.MaxValue. */
  def minHashSig(s: String, shingle: Int, numHashes: Int, seed: Long): Array[Long] = {
    val sh = shingleHashes(s, shingle)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var k = 0
      while (k < numHashes) {
        val v = mix64(sh(i) ^ (seed + k * 0xC2B2AE3D27D4EB4FL))
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over unigram token hashes: per-bit majority vote. */
  def simHash64(s: String): Long = {
    val th = tokenHashes(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** Distinct, sorted n-shingle hash set of one document — the per-doc
    * half of [[shingleJaccard]], exposed so blocked joins can compute it
    * ONCE per document instead of re-tokenizing per candidate pair. */
  def shingleSet(s: String, n: Int): Array[Long] =
    distinctSorted(shingleHashes(s, n))

  private val wordGramSplit = java.util.regex.Pattern.compile("[ \\t\\n\\r]+")

  /** Distinct, sorted hashes of the EXACT word n-gram STRINGS the
    * `wordGrams` Column form produces: space-only trim (Spark `trim`
    * strips 0x20 only — \t/\n/\f/\x0B survive), `[ \t\n\r]+` split with
    * limit -1 (leading/trailing separators yield empty tokens, exactly
    * as Spark `split` does), windows of n tokens joined with " ". The
    * hash is over the JOINED gram string, so equal gram strings hash
    * equal no matter how their tokens divided — a candidate gate built
    * on this set is a strict superset of the string-keyed gram
    * equi-join (hash collisions only ever ADD candidates). This is NOT
    * [[shingleSet]]: that kernel's Java-`\s`/full-trim tokenizer
    * diverges from `wordGrams` on \f/\x0B and leading-\t texts, which
    * is precisely why the contamination gates must not use it. Texts
    * with fewer than n tokens yield the empty set (wordGrams emits no
    * grams there). */
  def wordGramHashSet(s: String, n: Int): Array[Long] = {
    // space-only trim, matching Spark SQL trim()
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    val toks = wordGramSplit.split(t, -1)
    if (toks.length < n) return Array.empty
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      // hash the joined gram string "tok_i tok_{i+1} ... tok_{i+n-1}"
      var h = 0x9E3779B97F4A7C15L
      var j = i
      while (j < i + n) {
        if (j > i) h = mix64(h ^ ' '.toLong)
        val tok = toks(j)
        var c = 0
        while (c < tok.length) { h = mix64(h ^ tok.charAt(c).toLong); c += 1 }
        j += 1
      }
      out(i) = h
      i += 1
    }
    distinctSorted(out)
  }

  /** The per-pair half of [[shingleJaccard]]: Jaccard of two
    * distinct-sorted hash arrays by merge intersection — bit-identical
    * to `shingleJaccard(a, b, n)` when fed each side's [[shingleSet]]. */
  def sortedJaccard(sa: Array[Long], sb: Array[Long]): Double = {
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    inter.toDouble / (sa.length + sb.length - inter).toDouble
  }

  /** Exact Jaccard similarity of the two documents' n-shingle SETS. */
  def shingleJaccard(a: String, b: String, n: Int): Double =
    sortedJaccard(shingleSet(a, n), shingleSet(b, n))

  /** Content-defined chunking (the rsync/LBFS discipline): a cut lands
    * after position i when the rolling hash of the LAST `window` chars
    * satisfies `(h & mask) == 0` — boundaries depend only on local
    * content, so an edit realigns within ~window + minSize chars
    * instead of shifting every later boundary the way fixed-width
    * chunking does (what makes chunk-level dedup survive insertions).
    * `minSize` suppresses cuts too close to the previous one, `maxSize`
    * forces one; with mask = 2^k - 1 the expected chunk is ~2^k chars.
    * Wrapping 64-bit polynomial arithmetic (base 257) — deterministic
    * everywhere. Chunks concatenate back to the input exactly. */
  def cdcChunks(s: String, window: Int, mask: Long, minSize: Int,
                maxSize: Int): Array[String] = {
    require(window >= 1 && minSize >= 1 && maxSize >= minSize,
      s"cdc: need window >= 1 and 1 <= minSize <= maxSize " +
        s"(window=$window, minSize=$minSize, maxSize=$maxSize)")
    val n = s.length
    if (n == 0) return Array.empty
    val B = 257L
    var bw = 1L // B^window, wrapping
    var w = 0
    while (w < window) { bw *= B; w += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = h * B + s.charAt(i)
      if (i >= window) h -= s.charAt(i - window) * bw
      val len = i - start + 1
      if ((len >= minSize && i >= window - 1 && (h & mask) == 0L) ||
        len >= maxSize) {
        out += s.substring(start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += s.substring(start)
    out.toArray
  }

  def cdcChunksU(s: UTF8String, window: Int, mask: Long, minSize: Int,
                 maxSize: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cdcChunks(s.toString, window, mask, minSize, maxSize)
        .map(c => UTF8String.fromString(c): Any))

  private def distinctSorted(xs: Array[Long]): Array[Long] = {
    if (xs.length <= 1) return xs
    val c = xs.clone()
    java.util.Arrays.sort(c)
    var w = 1
    var i = 1
    while (i < c.length) {
      if (c(i) != c(w - 1)) { c(w) = c(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(c, w)
  }

  /** 64-bit content fingerprint: polynomial rolling hash over the
    * whitespace-normalized, lower-cased character stream. */
  def fingerprint64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    var pendingSpace = false // separator is emitted lazily so leading and
    var started = false      // trailing whitespace never affect the hash
    while (i < s.length) {
      val c0 = s.charAt(i)
      if (Character.isWhitespace(c0)) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { h = (h ^ ' '.toLong) * 0x100000001B3L; pendingSpace = false }
        h = (h ^ Character.toLowerCase(c0).toLong) * 0x100000001B3L
        started = true
      }
      i += 1
    }
    h
  }

  // Minimal per-language function-word profiles for the id heuristic.
  private val profiles: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr" -> Array("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Array("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"))
  private val profileSets: Array[(String, java.util.HashSet[String])] =
    profiles.map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (l, s)
    }

  /** Heuristic language id: CJK codepoint share first, else the
    * function-word profile with the most token hits ('und' => unknown
    * ties resolve to profile order, 'en' first). */
  def langId(s: String): String = {
    var han = 0
    var kana = 0
    var hangul = 0
    var letters = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeScript.of(c)
        if (block == Character.UnicodeScript.HAN) han += 1
        else if (block == Character.UnicodeScript.HIRAGANA ||
                 block == Character.UnicodeScript.KATAKANA) kana += 1
        else if (block == Character.UnicodeScript.HANGUL) hangul += 1
      }
      i += 1
    }
    val cjk = han + kana + hangul
    if (letters > 0 && cjk * 2 > letters) {
      // script decides the language: any kana means Japanese (Japanese
      // prose mixes Han + kana), Hangul means Korean, pure Han is Chinese
      return if (kana > 0) "ja" else if (hangul > 0) "ko" else "zh"
    }
    val toks = tokenize(s.toLowerCase)
    var best = "und"
    var bestHits = 0
    var p = 0
    while (p < profileSets.length) {
      val (lang, set) = profileSets(p)
      var hits = 0
      var t = 0
      while (t < toks.length) { if (set.contains(toks(t))) hits += 1; t += 1 }
      if (hits > bestHits) { best = lang; bestHits = hits }
      p += 1
    }
    best
  }

  // UTF8String entry points used by generated code.
  def shingleJaccardU(a: UTF8String, b: UTF8String, n: Int): Double =
    shingleJaccard(a.toString, b.toString, n)
  def shingleSetU(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(shingleSet(s.toString, n))
  def wordGramHashSetU(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(wordGramHashSet(s.toString, n))
  /** Merge-intersection Jaccard directly over catalyst arrays — no
    * copy out of the unsafe format. */
  def sortedJaccardAD(a: org.apache.spark.sql.catalyst.util.ArrayData,
                      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val (la, lb) = (a.numElements(), b.numElements())
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (la + lb - inter).toDouble
  }
  def simHash64U(s: UTF8String): Long = simHash64(s.toString)
  def fingerprint64U(s: UTF8String): Long = fingerprint64(s.toString)
  def langIdU(s: UTF8String): UTF8String = UTF8String.fromString(langId(s.toString))
  def minHashSigU(s: UTF8String, shingle: Int, numHashes: Int, seed: Long)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      minHashSig(s.toString, shingle, numHashes, seed))
}
