package graft.operators

import graft.text.TextKernel

/** Text-analysis primitives for the LLM-data-pipeline surface (§2.C): language
  * identification, quality scoring, token statistics. Pure Scala — wired into
  * Spark via columns/flatMap in TextQueries; unit-tested directly.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. Small,
    * high-frequency function words per language (public linguistic knowledge).
    */
  val stopwordProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "of", "and", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be"),
    "de" -> Set("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "auf", "für", "von", "zu", "den"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "es", "no", "por", "con", "para", "los", "las"),
    "fr" -> Set("le", "la", "les", "de", "et", "un", "une", "est", "pas", "que", "pour", "dans", "qui", "sur", "avec"))

  /** Heuristic language ID: CJK codepoint share decides zh; otherwise the
    * stopword profile with the most hits wins (deterministic tie-break by
    * language code). Returns "und" when nothing matches.
    */
  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(cp =>
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)).count()
    // ratio over CODEPOINTS (not UTF-16 units): encoding-independent, and
    // what the DuckDB oracle's length() computes
    val nCp = text.codePointCount(0, text.length)
    if (cjk > 0 && cjk.toDouble / nCp > 0.05) return "zh"
    val toks = TextKernel.tokens(text.toLowerCase(java.util.Locale.ROOT))
    if (toks.isEmpty) return "und"
    val scores = stopwordProfiles.view.mapValues(sw => toks.count(sw.contains)).toMap
    val (bestLang, bestScore) = scores.toSeq.sortBy { case (l, sc) => (-sc, l) }.head
    if (bestScore == 0) "und" else bestLang
  }

  /** Quality heuristics (length / punctuation / stopword ratios) mirroring
    * what a pretraining-data filter computes per document.
    */
  final case class Quality(
      nChars: Int,
      nTokens: Int,
      meanTokenLen: Double,
      punctRatio: Double,
      stopwordRatio: Double,
      score: Double)

  private val enStop = stopwordProfiles("en")

  def quality(text: String): Quality = {
    val norm = TextKernel.normalize(text)
    val toks = TextKernel.tokens(norm)
    // all lengths in CODEPOINTS (not UTF-16 units) — encoding-independent
    // and identical to the DuckDB oracle's length()
    val nChars = norm.codePointCount(0, norm.length)
    val nTokens = toks.length
    val meanLen = if (nTokens == 0) 0.0
      else toks.map(t => t.codePointCount(0, t.length)).sum.toDouble / nTokens
    val punct = norm.count(c => ".,;:!?".indexOf(c) >= 0)
    val punctRatio = if (nChars == 0) 0.0 else punct.toDouble / nChars
    val stopRatio = if (nTokens == 0) 0.0 else toks.count(t => enStop.contains(t.toLowerCase(java.util.Locale.ROOT))).toDouble / nTokens
    // Higher = more natural-language-like: bounded word lengths, some
    // punctuation, some function words.
    val score =
      (if (meanLen >= 3 && meanLen <= 10) 0.4 else 0.0) +
      (if (punctRatio > 0 && punctRatio < 0.1) 0.3 else 0.0) +
      (if (stopRatio > 0.05) 0.3 else 0.0)
    Quality(nChars, nTokens, meanLen, punctRatio, stopRatio, score)
  }
}
