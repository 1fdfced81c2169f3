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
}
