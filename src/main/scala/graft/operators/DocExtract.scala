package graft.operators

import graft.text.TextKernel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-extraction stage (SURVEY.md §2.A A2-A6): binary document →
  * page-tagged fragments → assembled text, including the conditional-OCR
  * branch (A5: pages with < 100 chars of extracted text go through OCR —
  * threshold from reference embedding_utils.py:143).
  *
  * PDF parsing itself is external (BASELINE.json): the extractor contract
  * takes bytes and returns pages; `TextBytesExtractor` implements it for
  * plain-text payloads (form-feed = page break) so the whole stage is
  * runnable and testable here. OCR is likewise a contract (the reference
  * calls Azure Vision, embedding_utils.py:53-100) with a deterministic stub.
  */
object DocExtract {

  final case class Page(page: Int, text: String, tables: Seq[String])

  trait PageExtractor extends Serializable {
    /** bytes → ordered pages; never throws (A22 per-row containment). */
    def extract(bytes: Array[Byte]): Seq[Page]
  }

  /** Plain-text extractor: UTF-8 decode, form-feed (\f) separates pages.
    * A4 table extraction: tab-separated line blocks inside a page are pulled
    * out as stringified tables (the reference flattens tables to text too —
    * pandas to_string, embedding_utils.py:112-115; tabular structure is
    * intentionally NOT preserved).
    */
  final class TextBytesExtractor extends PageExtractor {
    def extract(bytes: Array[Byte]): Seq[Page] =
      try {
        if (bytes == null) Seq.empty
        else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .split('\f').toSeq.zipWithIndex
          .map { case (t, i) =>
            val lines = t.split('\n')
            val (tableLines, textLines) = lines.partition(l => l.contains('\t') && l.trim.nonEmpty)
            val tables =
              if (tableLines.isEmpty) Seq.empty[String]
              else Seq(tableLines.map(_.replace('\t', ' ')).mkString("\n"))
            Page(i + 1, textLines.mkString("\n"), tables)
          }
      } catch { case _: Throwable => Seq.empty }
  }

  trait Ocr extends Serializable {
    /** page image bytes → recognized text; errors → "" (ref :98-100). */
    def recognize(imageBytes: Array[Byte]): String
  }

  /** STUB OCR: deterministic fake (hash-derived token) standing in for the
    * external vision service; same contract, same error semantics.
    */
  final class StubOcr extends Ocr {
    def recognize(imageBytes: Array[Byte]): String =
      try {
        if (imageBytes == null || imageBytes.isEmpty) ""
        else s"ocr_text_${TextKernel.md5Hex(new String(imageBytes.take(64), "ISO-8859-1")).take(8)}"
      } catch { case _: Throwable => "" }
  }

  /** OCR trigger threshold — semantic constant from the reference
    * (embedding_utils.py:143).
    */
  val OcrThreshold = 100

  /** (doc_id, content: binary) → one row per page with provenance tags
    * (A2+A3+A4): page text, stringified tables joined by blank lines
    * (embedding_utils.py:140), needs_ocr flag. Narrow flatMap, no shuffle.
    */
  def extractPages(spark: SparkSession, docs: DataFrame,
                   extractor: PageExtractor = new TextBytesExtractor()): DataFrame = {
    import spark.implicits._
    // NOT spread: the page splitter is a cheap byte scan and the payload is
    // the binary content itself — an added exchange moves every byte once
    // for no CPU win (measured m06 1.59 → 2.28 s with a spread here)
    docs.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        extractor.extract(bytes).map(p =>
          (id, p.page, p.text, p.tables.mkString("\n\n"), p.text.trim.length < OcrThreshold))
      }
      .toDF("doc_id", "page", "page_text", "page_tables", "needs_ocr")
  }

  /** A5 conditional OCR + A6 fragment tagging: short pages get OCR'd (their
    * payload passed as the page image), every fragment gets the reference's
    * provenance prefix ("[Page N OCR Text]:" / "[Page N Text]:",
    * embedding_utils.py:153,157), then pages are reassembled per document
    * joined by "\n\n" in page order (A6, :167).
    */
  def assembleWithOcr(spark: SparkSession, pages: DataFrame,
                      ocr: Ocr = new StubOcr()): DataFrame =
    taggedFragments(spark, pages, ocr)
      .groupBy("doc_id")
      .agg(concat_ws("\n\n", array_sort(collect_list(struct(col("page"), col("fragment"))))
        .getField("fragment")).as("document_text"))

  /** The per-page tagged fragment of [[assembleWithOcr]], factored out so
    * the provenance-carrying assembly below builds the EXACT same
    * fragments (one per page, tables inlined) — the two assemblies cannot
    * drift.
    */
  private def taggedFragments(spark: SparkSession, pages: DataFrame,
                              ocr: Ocr): DataFrame = {
    import spark.implicits._
    pages
      .select(col("doc_id"), col("page"), col("page_text"), col("page_tables"), col("needs_ocr"))
      .as[(Long, Int, String, String, Boolean)]
      .map { case (id, page, text, tables, needsOcr) =>
        val textFragment =
          if (needsOcr) {
            val recognized = ocr.recognize(text.getBytes("UTF-8"))
            if (recognized.nonEmpty) s"[Page $page OCR Text]:\n$recognized"
            else s"[Page $page Text]:\n$text"
          } else s"[Page $page Text]:\n$text"
        // A4: tables appended as their own tagged fragment (ref :139-140)
        val fragment =
          if (tables.nonEmpty) s"$textFragment\n\n[Page $page Table]:\n$tables"
          else textFragment
        (id, page, fragment)
      }
      .toDF("doc_id", "page", "fragment")
  }

  /** A6 with TRUE PAGE PROVENANCE: same assembly as [[assembleWithOcr]],
    * plus `page_starts` — for every page, the 1-based offset of its
    * fragment in the NORMALIZED assembled document. Downstream chunking
    * (Chunker.chunkWithOffsets over `document_text`) then maps any chunk
    * offset to its real page — the provenance the reference fakes with
    * `page_number = chunk_id + 1` (main.py:305; SURVEY §1.2).
    *
    * Offsets are exact by the same normalize-concatenation identity d16
    * relies on: fragments never normalize to empty (tags are non-empty),
    * so normalize(f0 + "\n\n" + f1 + ...) = normalize(f0) + " " +
    * normalize(f1) + ... and start(k+1) = start(k) + |normalize(fk)| + 1.
    */
  def assembleWithProvenance(spark: SparkSession, pages: DataFrame,
                             ocr: Ocr = new StubOcr()): DataFrame = {
    import spark.implicits._
    taggedFragments(spark, pages, ocr)
      .select(col("doc_id"), col("page"), col("fragment"))
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val frags = it.toSeq.sortBy(_._2)
        val starts = Seq.newBuilder[(Int, Int)]
        var cursor = 1
        frags.foreach { case (_, page, fragment) =>
          starts += ((page, cursor))
          cursor += TextKernel.normalize(fragment).length + 1
        }
        (id, frags.map(_._3).mkString("\n\n"), starts.result())
      }
      .toDF("doc_id", "document_text", "page_starts")
  }
}
