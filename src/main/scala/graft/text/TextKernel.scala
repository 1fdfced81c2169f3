package graft.text

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pure text utilities of the ingestion pipeline (SURVEY.md §2.A A7/A9/A10).
  *
  * All functions are deterministic, null-tolerant, and Spark-free so they can
  * run inside codegen'd expressions, `Dataset.flatMap` closures, and plain unit
  * tests alike.
  */
object TextKernel {

  /** Whitespace normalization: collapse runs of whitespace to one space and
    * trim (reference embedding_utils.py:44-50). Matches Spark's
    * `trim(regexp_replace(col, "\\s+", " "))` and the DuckDB oracle's
    * `trim(regexp_replace(text, '\s+', ' ', 'g'))`.
    */
  def normalize(text: String): String =
    if (text == null) "" else text.replaceAll("\\s+", " ").trim

  /** Restrict a document key to `[a-zA-Z0-9_\-=]`, replacing everything else
    * with `_` (reference embedding_utils.py:16-21).
    */
  def sanitizeKey(key: String): String =
    if (key == null) "" else key.replaceAll("[^a-zA-Z0-9_\\-=]", "_")

  /** Per-thread MessageDigest: getInstance() per call costs more than the
    * 16-byte digest itself in signature hot loops (millions of shingle
    * hashes per executor core).
    */
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5Bytes(text: String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest((if (text == null) "" else text).getBytes(StandardCharsets.UTF_8))
  }

  /** Lowercase-hex md5 of the UTF-8 bytes (reference embedding_utils.py:39-41);
    * bit-identical to Spark's `md5` and DuckDB's `md5`.
    */
  def md5Hex(text: String): String = {
    val bytes = md5Bytes(text)
    val sb = new StringBuilder(32)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** First 64 bits of md5(s) as a signed Long (big-endian byte prefix,
    * two's-complement reinterpretation — identical to parsing the first 16
    * hex chars). The base hash of the MinHash / SimHash signature families:
    * unlike JVM murmur3, any engine that has md5 (DuckDB, Postgres, Spark
    * SQL itself) recomputes it exactly, which is what makes the signature
    * queries oracle-checkable end-to-end. Bytes are combined directly — no
    * hex-string round trip in the hot loop.
    */
  def md5Hash64(s: String): Long = {
    val d = md5Bytes(s)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** First 32 bits of md5(s) as a non-negative Long (bucket ids). */
  def md5Hash32(s: String): Long = {
    val d = md5Bytes(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Whitespace tokenization used by token counting and shingling. */
  def tokens(text: String): Array[String] =
    if (text == null) Array.empty
    else {
      val t = text.trim
      if (t.isEmpty) Array.empty else t.split("\\s+")
    }

  /** Word n-gram shingles for MinHash / Jaccard dedup. */
  def shingles(text: String, n: Int): Set[String] = {
    val toks = tokens(if (text == null) null else text.toLowerCase(java.util.Locale.ROOT))
    if (toks.length < n) {
      if (toks.isEmpty) Set.empty else Set(toks.mkString(" "))
    } else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Character n-gram set (used by n-gram Jaccard similarity). */
  def charNgrams(text: String, n: Int): Set[String] = {
    val t = if (text == null) "" else text
    if (t.length < n) { if (t.isEmpty) Set.empty else Set(t) }
    else t.sliding(n).toSet
  }

  /** Deterministic 64-bit polynomial rolling hash of the whole string
    * (document fingerprinting). Base/modulus chosen from the standard
    * Rabin-Karp construction. Folds UNICODE CODEPOINTS (not UTF-16 code
    * units) so the definition is encoding-independent and the DuckDB
    * oracle — which iterates codepoints — recomputes it exactly for any
    * text, including supplementary-plane characters.
    */
  def rollingFingerprint(text: String): Long = {
    var h = 1125899906842597L // large prime seed
    val t = if (text == null) "" else text
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h = 31 * h + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): Rabin
    * rolling hashes of all k-grams, then the minimum hash in each sliding
    * window of `window` hashes (rightmost-min tie-break). Guarantees any
    * shared substring of length >= k + window - 1 between two documents
    * yields at least one shared fingerprint — the compact index behind
    * partial-overlap / substring dedup at corpus scale. k-grams are over
    * UNICODE CODEPOINTS (see [[rollingFingerprint]]) so the DuckDB oracle's
    * codepoint iteration recomputes identical hashes for any text.
    */
  def winnow(text: String, k: Int = 8, window: Int = 4): Set[Long] = {
    val codes = normalize(text).codePoints().toArray
    if (codes.length < k) return Set.empty
    val nGrams = codes.length - k + 1
    val hashes = new Array[Long](nGrams)
    // rolling polynomial hash, base 257
    val base = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + codes(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - codes(i - 1) * pow) * base + codes(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (nGrams <= window) return Set(hashes.min)
    val out = scala.collection.mutable.Set.empty[Long]
    var start = 0
    while (start + window <= nGrams) {
      var minIdx = start
      var j = start + 1
      while (j < start + window) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      out += hashes(minIdx)
      start += 1
    }
    out.toSet
  }
}
