package graft.text

import scala.collection.mutable.ListBuffer

/** Scala reimplementation of the recursive character chunker the reference
  * uses (reference embedding_utils.py:176-186: LangChain
  * `RecursiveCharacterTextSplitter(chunk_size=400, chunk_overlap=100,
  * separators=["\n\n","\n",". "," ",""], length_function=len)`).
  *
  * Semantics follow the published LangChain algorithm (keep_separator=true,
  * strip_whitespace=true, non-regex separators):
  *   1. pick the first separator in the list that occurs in the text (the
  *      empty separator always matches and splits into single characters);
  *   2. split, re-attaching each separator to the piece that FOLLOWS it;
  *   3. pieces shorter than `chunkSize` are greedily merged into chunks with a
  *      sliding overlap window of at most `chunkOverlap` characters;
  *   4. pieces still longer than `chunkSize` recurse with the remaining
  *      separators.
  *
  * Pure function of the input — required for deterministic oracle checks.
  */
final class RecursiveCharacterTextSplitter(
    val chunkSize: Int = 400,
    val chunkOverlap: Int = 100,
    val separators: List[String] = List("\n\n", "\n", ". ", " ", "")) extends Serializable {

  require(chunkOverlap < chunkSize, "overlap must be smaller than chunk size")

  def splitText(text: String): List[String] =
    if (text == null || text.isEmpty) Nil else split(text, separators)

  private def split(text: String, seps: List[String]): List[String] = {
    // First separator present in the text wins; "" is a universal fallback.
    var separator = if (seps.nonEmpty) seps.last else ""
    var newSeparators: List[String] = Nil
    var i = 0
    var found = false
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) { separator = s; newSeparators = seps.drop(i + 1); found = true }
      i += 1
    }

    val splits = splitKeepingSeparator(text, separator)
    val finalChunks = new ListBuffer[String]
    val goodSplits = new ListBuffer[String]
    // keep_separator=true => pieces already carry their separator; merge with "".
    val mergeSeparator = ""
    splits.foreach { s =>
      if (s.length < chunkSize) goodSplits += s
      else {
        if (goodSplits.nonEmpty) {
          finalChunks ++= mergeSplits(goodSplits.toList, mergeSeparator)
          goodSplits.clear()
        }
        if (newSeparators.isEmpty) finalChunks += s
        else finalChunks ++= split(s, newSeparators)
      }
    }
    if (goodSplits.nonEmpty) finalChunks ++= mergeSplits(goodSplits.toList, mergeSeparator)
    finalChunks.toList
  }

  /** Split on a literal separator, attaching each separator occurrence to the
    * piece that follows it; empty pieces are dropped. Empty separator splits
    * into single characters.
    */
  private[text] def splitKeepingSeparator(text: String, sep: String): List[String] = {
    if (sep.isEmpty) return text.toList.map(_.toString)
    val out = new ListBuffer[String]
    val first = text.indexOf(sep)
    if (first < 0) {
      if (text.nonEmpty) out += text
      return out.toList
    }
    if (first > 0) out += text.substring(0, first)
    var idx = first
    while (idx >= 0) {
      val next = text.indexOf(sep, idx + sep.length)
      val end = if (next < 0) text.length else next
      out += text.substring(idx, end) // separator prefix + following content
      idx = next
    }
    out.toList
  }

  /** Greedy merge with overlap carry-over (LangChain `_merge_splits`). */
  private def mergeSplits(splits: List[String], separator: String): List[String] = {
    val sepLen = separator.length
    val docs = new ListBuffer[String]
    var current = List.empty[String] // kept in order; dropped from the front
    var total = 0
    def sepIf(cond: Boolean): Int = if (cond) sepLen else 0
    splits.foreach { d =>
      val len = d.length
      if (total + len + sepIf(current.nonEmpty) > chunkSize) {
        if (current.nonEmpty) {
          joinDocs(current, separator).foreach(docs += _)
          while (total > chunkOverlap ||
                 (total + len + sepIf(current.nonEmpty) > chunkSize && total > 0)) {
            total -= current.head.length + sepIf(current.lengthCompare(1) > 0)
            current = current.tail
          }
        }
      }
      current = current :+ d
      total += len + sepIf(current.lengthCompare(1) > 0)
    }
    joinDocs(current, separator).foreach(docs += _)
    docs.toList
  }

  /** Join accumulated pieces; strip; drop if empty (strip_whitespace=true). */
  private def joinDocs(docs: List[String], separator: String): Option[String] = {
    val text = docs.mkString(separator).strip()
    if (text.isEmpty) None else Some(text)
  }

  // -------------------------------------------------------------------
  // Span-tracked variant: [[splitText]] with TRUE character provenance.
  // Every intermediate piece of the algorithm is a CONTIGUOUS region of
  // the input (splitting yields adjacent regions; merging joins adjacent
  // regions with the "" separator; stripping only moves the ends inward),
  // so the whole recursion can run on (start, end) index pairs. Mirrors
  // split/splitKeepingSeparator/mergeSplits/joinDocs line for line —
  // parity with the string path is pinned over the 852-case golden corpus
  // (ChunkerSpec). Spans are 0-based, end-exclusive, already stripped.
  // -------------------------------------------------------------------

  def splitSpans(text: String): List[(Int, Int)] =
    if (text == null || text.isEmpty) Nil
    else splitSpans(text, 0, text.length, separators)
      .flatMap(sp => stripSpan(text, sp)) // chunkText's filter(_.strip.nonEmpty)

  private def splitSpans(text: String, start: Int, end: Int,
                         seps: List[String]): List[(Int, Int)] = {
    var separator = if (seps.nonEmpty) seps.last else ""
    var newSeparators: List[String] = Nil
    var i = 0
    var found = false
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (indexOfIn(text, s, start, end) >= 0) {
        separator = s; newSeparators = seps.drop(i + 1); found = true
      }
      i += 1
    }

    val splits = splitSpansKeepingSeparator(text, start, end, separator)
    val finalChunks = new ListBuffer[(Int, Int)]
    val goodSplits = new ListBuffer[(Int, Int)]
    splits.foreach { case sp @ (s, e) =>
      if (e - s < chunkSize) goodSplits += sp
      else {
        if (goodSplits.nonEmpty) {
          finalChunks ++= mergeSpans(text, goodSplits.toList)
          goodSplits.clear()
        }
        if (newSeparators.isEmpty) finalChunks += sp
        else finalChunks ++= splitSpans(text, s, e, newSeparators)
      }
    }
    if (goodSplits.nonEmpty) finalChunks ++= mergeSpans(text, goodSplits.toList)
    finalChunks.toList
  }

  /** First occurrence of `sep` fully inside [from, end), or -1. (indexOf
    * returns the EARLIEST match at or after `from`; if that one does not
    * fit before `end`, no later one can.)
    */
  private def indexOfIn(text: String, sep: String, from: Int, end: Int): Int = {
    val i = text.indexOf(sep, from)
    if (i >= 0 && i + sep.length <= end) i else -1
  }

  private def splitSpansKeepingSeparator(text: String, start: Int, end: Int,
                                         sep: String): List[(Int, Int)] = {
    if (sep.isEmpty) return (start until end).map(i => (i, i + 1)).toList
    val out = new ListBuffer[(Int, Int)]
    val first = indexOfIn(text, sep, start, end)
    if (first < 0) {
      if (end > start) out += ((start, end))
      return out.toList
    }
    if (first > start) out += ((start, first))
    var idx = first
    while (idx >= 0) {
      val next = indexOfIn(text, sep, idx + sep.length, end)
      val pieceEnd = if (next < 0) end else next
      out += ((idx, pieceEnd))
      idx = next
    }
    out.toList
  }

  /** [[mergeSplits]] on spans (merge separator "" → sepLen 0 throughout,
    * exactly the string path's configuration).
    */
  private def mergeSpans(text: String, splits: List[(Int, Int)]): List[(Int, Int)] = {
    val docs = new ListBuffer[(Int, Int)]
    var current = List.empty[(Int, Int)]
    var total = 0
    splits.foreach { case d @ (ds, de) =>
      val len = de - ds
      if (total + len > chunkSize) {
        if (current.nonEmpty) {
          joinSpans(text, current).foreach(docs += _)
          while (total > chunkOverlap || (total + len > chunkSize && total > 0)) {
            total -= current.head._2 - current.head._1
            current = current.tail
          }
        }
      }
      current = current :+ d
      total += len
    }
    joinSpans(text, current).foreach(docs += _)
    docs.toList
  }

  /** [[joinDocs]] on spans: adjacent pieces concatenate to the enclosing
    * region; strip moves the ends inward; whitespace-only spans drop.
    */
  private def joinSpans(text: String, docs: List[(Int, Int)]): Option[(Int, Int)] =
    stripSpan(text, (docs.head._1, docs.last._2))

  private def stripSpan(text: String, sp: (Int, Int)): Option[(Int, Int)] = {
    var (s, e) = sp
    while (s < e && Character.isWhitespace(text.charAt(s))) s += 1
    while (e > s && Character.isWhitespace(text.charAt(e - 1))) e -= 1
    if (s >= e) None else Some((s, e))
  }
}

object Chunker {
  /** Reference defaults: CHUNK_SIZE=400, CHUNK_OVERLAP=100
    * (embedding_utils.py:35-36).
    */
  val default = new RecursiveCharacterTextSplitter()

  /** Full reference `chunk_text` semantics (embedding_utils.py:176-186):
    * split, then normalize each chunk, dropping whitespace-only chunks.
    */
  def chunkText(text: String, splitter: RecursiveCharacterTextSplitter = default): List[String] =
    splitter.splitText(if (text == null) "" else text)
      .filter(_.strip().nonEmpty)
      .map(TextKernel.normalize)

  /** [[chunkText]] with TRUE character provenance: each chunk paired with
    * its (start_off, end_off) — 1-based start, exclusive end — into the
    * NORMALIZED document, such that
    * `substr(normalize(doc), start_off, end_off - start_off) == content`
    * (the plain-SQL consistency predicate d16 hash-gates; the reference
    * stores `page_number = chunk_id + 1` instead, main.py:305 — the
    * provenance bug SURVEY §1.2 flags).
    *
    * Why offsets into the normalized doc exist at all: every chunk is
    * `normalize(s)` for a contiguous raw span `s`, and normalizing any
    * substring of a document yields a contiguous substring of the
    * normalized document (internal whitespace runs collapse identically;
    * boundary runs are trimmed from the chunk's side). Localization walks
    * a monotone search floor — chunk starts never decrease (the overlap
    * window only ever drops pieces from the front), so the first match at
    * or after the previous start IS the chunk's position. Cannot produce a
    * wrong offset: the returned span always satisfies the substring
    * predicate, and an impossible miss degrades to (-1, -1) rather than
    * throwing (A22 discipline).
    */
  def chunkWithOffsets(text: String,
                       splitter: RecursiveCharacterTextSplitter = default): List[(String, Int, Int)] = {
    if (text == null || text.isEmpty) return Nil
    val norm = TextKernel.normalize(text)
    // raw→normalized index map: for every raw index holding a non-\s char,
    // its position in the normalized string (whitespace runs collapse to
    // one space between content, leading/trailing runs vanish). \s here is
    // the regex class TextKernel.normalize collapses — NOT String.strip's
    // broader isWhitespace — so the map mirrors normalize exactly.
    val normAt = new Array[Int](text.length)
    var np = 0
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isRegexSpace =
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (isRegexSpace) { normAt(i) = -1; if (started) pendingSpace = true }
      else {
        if (pendingSpace) { np += 1; pendingSpace = false }
        normAt(i) = np
        np += 1
        started = true
      }
      i += 1
    }
    // true raw spans from the span-tracked split (survives aliasing that
    // defeats any search-based localization: identical overlapping chunks
    // in repetitive text still get their REAL positions)
    var floor = 0 // monotone search floor for the degraded path: chunk
                  // starts never decrease, so even a fallback search must
                  // not land on an EARLIER duplicate of repeated content
    splitter.splitSpans(text).map { case (s0, e0) =>
      // tighten to the \s definition: the span was stripped with
      // isWhitespace; normalize's trim may keep exotic whitespace as
      // content, and drops only \s-class ends
      var s = s0
      var e = e0
      while (s < e && normAt(s) < 0) s += 1
      while (e > s && normAt(e - 1) < 0) e -= 1
      val content = TextKernel.normalize(text.substring(s0, e0))
      if (s >= e || content.isEmpty) (content, -1, -1)
      else {
        val st = normAt(s)
        val en = normAt(e - 1) + 1
        // exactness guard: the span-derived region must BE the content;
        // degrade to a floored search rather than emit a wrong offset (A22)
        if (en - st == content.length && norm.regionMatches(st, content, 0, content.length)) {
          floor = st
          (content, st + 1, en + 1)
        } else {
          val hit = norm.indexOf(content, floor) match {
            case -1 => norm.indexOf(content) // better a non-monotone true
            case i  => i                     // match than none at all
          }
          if (hit < 0) (content, -1, -1)
          else { floor = math.max(floor, hit); (content, hit + 1, hit + 1 + content.length) }
        }
      }
    }
  }
}
