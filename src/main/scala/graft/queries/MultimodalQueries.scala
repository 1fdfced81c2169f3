package graft.queries

import graft.operators.{DocExtract, Multimodal}
import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

/** Multimodal + extraction surface (§2.A A2-A6, §2.C multimodal columns).
  * The fixture set has no binary media, so the payloads are synthesized from
  * document text (encode → binary) — the decode step is a stub either way
  * (no codecs in this container); the Spark plumbing (schema, per-partition
  * batching, narrow maps) is the real, tested artifact. Every query is
  * hash-gated (direct SQL recompute or golden-VALUES corpus digest);
  * behavior is unit-tested in MultimodalSpec/DocExtractSpec.
  */
object MultimodalQueries extends QuerySet {

  /** documents → media-shaped frame (binary payload + metadata). */
  private def synthMedia(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents").select(
      concat(col("source"), lit("_"), col("doc_id")).as("media_id"),
      lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
      md5(col("text")).as("content_hash"))

  def queries: Seq[Q] = Seq(

    // Binary columns + typed metadata + per-partition feature extraction.
    // HASH-GATED: the stub decoder's metadata is deterministic arithmetic
    // on the payload byte length (StubDecoder.decodeFeatures — fakeW/fakeH
    // from byte_len mod/div 64, dims fixed), so the oracle recomputes the
    // full output from `documents` directly. A real codec would move this
    // back behind a golden gate; the Spark plumbing under test (binary
    // column, per-partition batch map, schema) is identical either way.
    Q("m01_media_features",
      (s, d) => Multimodal.extractFeatures(s, synthMedia(s, d))
        .select(col("media_id"), col("modality"), col("width"), col("height"),
          size(col("features")).as("n_dims"))
        .orderBy("media_id"),
      Some("""WITH m AS (
        |  SELECT source || '_' || CAST(doc_id AS VARCHAR) AS media_id,
        |    octet_length(encode(text)) AS bl FROM documents)
        |SELECT media_id, 'text' AS modality,
        |  CAST(64 + bl % 64 AS INT) AS width,
        |  CAST(64 + (bl // 64) % 64 AS INT) AS height,
        |  64 AS n_dims
        |FROM m ORDER BY media_id""".stripMargin)),

    // Frame/window sampling plumbing (video-style 1→N narrow expansion).
    // HASH-GATED: the stub samples every 4th 16-byte window, so per-media
    // frame count and max index are ceil/floor arithmetic on byte length.
    Q("m02_frame_sample",
      (s, d) => Multimodal.sampleFrames(s, synthMedia(s, d), everyK = 4)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), max("frame_idx").as("max_idx"))
        .orderBy("media_id"),
      Some("""WITH m AS (
        |  SELECT source || '_' || CAST(doc_id AS VARCHAR) AS media_id,
        |    (octet_length(encode(text)) + 15) // 16 AS nw
        |  FROM documents WHERE octet_length(encode(text)) > 0)
        |SELECT media_id, CAST((nw + 3) // 4 AS BIGINT) AS n_frames,
        |  CAST(((nw - 1) // 4) * 4 AS INT) AS max_idx
        |FROM m ORDER BY media_id""".stripMargin)),

    // A2-A6: page extraction + conditional OCR + provenance-tagged
    // assembly. HASH-GATED on this fixture: the corpus text is pure ASCII
    // with no \f/\t/\n (verified per generation by the oracle itself — a
    // fixture WITH page breaks would change the page count and fail
    // loudly), so each doc is one page, the OCR branch fires exactly on
    // trimmed length < 100, and the stub's recognized token is
    // 'ocr_text_' + md5(first 64 bytes) prefix — all recomputable in SQL.
    // The multi-page/table/provenance paths stay covered by m07 and
    // DocExtractSpec.
    Q("m03_extract_ocr_assemble",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
        val pages = DocExtract.extractPages(s, docs)
        DocExtract.assembleWithOcr(s, pages).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |  CASE WHEN length(trim(text)) < 100 AND length(text) > 0
        |    THEN '[Page 1 OCR Text]:' || chr(10) || 'ocr_text_' ||
        |         substr(md5(substr(text, 1, 64)), 1, 8)
        |    ELSE '[Page 1 Text]:' || chr(10) || text
        |  END AS document_text
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Resize plumbing: payload renormalized to the target pixel budget,
    // dims recorded in metadata (codec stubbed). HASH-GATED: the stub's
    // output metadata is the target dims + the fixed 32*32/16 byte budget.
    Q("m05_resize",
      (s, d) => Multimodal.resize(s, synthMedia(s, d), targetW = 32, targetH = 32)
        .select(col("media_id"), col("width"), col("height"),
          length(col("content")).as("byte_len"))
        .orderBy("media_id"),
      Some("""SELECT source || '_' || CAST(doc_id AS VARCHAR) AS media_id,
        | 32 AS width, 32 AS height, 64 AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin)),

    // The reference's full EP1 lifecycle from bytes (SURVEY.md §3):
    // binary doc → pages (A2-A4) → conditional OCR + tagged assembly
    // (A5-A6) → normalize/chunk/hash (A7-A9) → dedup (A12) → embed (A11) →
    // canonical store rows (A13). HASH-GATED like d10: every field of
    // every canonical row xor-folds into one corpus digest pinned per
    // fixture corpus (golden-VALUES); the byte-level raw dump stays
    // pinned in GoldenChunksSpec.
    Q("m06_e2e_binary_ingest",
      (s, d) => m06Canonical(s, d)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("id")).as("n_unique_ids"),
          canonicalDigest.as("canonical_digest")),
      Some(goldenBySize(
        "n_rows BIGINT, n_unique_ids BIGINT, canonical_digest BIGINT",
        GoldenM06))),

    // A8 via the SQL surface: LATERAL VIEW over the chunk_text Generator,
    // HASH-GATED as a corpus digest (the d08 golden-VALUES pattern — the
    // generator is exercised through the SQL surface end-to-end, and the
    // xor-folded digest of every (doc_id, chunk_id, chunk) pins each byte
    // of its output; the literal values are pinned per fixture corpus and
    // selected by document count).
    Q("m04_chunks_sql",
      (s, d) => {
        GraftFunctions.register(s)
        t(s, d, "documents").createOrReplaceTempView("documents")
        s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_chunks,
                |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_chunked,
                |  bit_xor(xxhash64(doc_id, c.chunk_id, c.chunk)) AS chunks_digest
                |FROM documents
                |LATERAL VIEW chunk_text(text) c AS chunk_id, chunk""".stripMargin)
      },
      Some(goldenBySize(
        "n_chunks BIGINT, n_docs_chunked BIGINT, chunks_digest BIGINT",
        GoldenM04))),

    // TRUE PAGE PROVENANCE through A6 assembly + A8 chunking (the page
    // half of SURVEY §1.2's provenance note; d16 covers the character
    // half): documents are paged at a fixed 200-char stride (\f page
    // breaks — the TextBytesExtractor contract), extracted, assembled
    // WITH per-page fragment offsets (DocExtract.assembleWithProvenance),
    // chunked with offsets, and every chunk mapped to the page whose
    // fragment contains its start. HASH-GATED invariants the oracle
    // recomputes from `documents` alone:
    //   - n_docs and total_pages (= Σ ceil(len/200), min 1) match the SQL
    //     page arithmetic exactly — wrong fragment spans break the sum;
    //   - every chunk maps to a page (n_unmapped = 0);
    //   - page is non-decreasing in chunk order (n_nonmonotone = 0);
    //   - each doc's LAST chunk ends inside its LAST page
    //     (docs_last_page_reached = n_docs) — the end-to-end check that
    //     fragment offsets and chunk offsets live in the same coordinate
    //     space.
    Q("m07_page_provenance",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val paged = t(s, d, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, tx) =>
            val raw = if (tx == null) "" else tx
            val pages = if (raw.isEmpty) List("") else raw.grouped(200).toList
            (id, pages.mkString("\f").getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          .toDF("doc_id", "content")
        val prov = DocExtract.assembleWithProvenance(s,
          DocExtract.extractPages(s, paged))
        val perChunk = prov
          .select(col("doc_id"), col("document_text"), col("page_starts"))
          .as[(Long, String, Seq[(Int, Int)])]
          .flatMap { case (id, txt, starts) =>
            val chunks = graft.text.Chunker.chunkWithOffsets(txt)
            val nPages = starts.size
            chunks.zipWithIndex.map { case ((_, st, en), i) =>
              def pageAt(off: Int): Int =
                starts.filter(_._2 <= off).map(_._1).maxOption.getOrElse(-1)
              (id, i, pageAt(st), pageAt(en - 1), nPages, i == chunks.size - 1)
            }
          }
          .toDF("doc_id", "chunk_id", "page", "page_end", "n_pages", "is_last")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_id")
        val flagged = perChunk
          .withColumn("prev_page", lag("page", 1).over(w))
        flagged.groupBy("doc_id").agg(
          first("n_pages").as("np"),
          sum(when(col("page") < 1, 1).otherwise(0)).as("unmapped"),
          sum(when(col("prev_page").isNotNull && col("page") < col("prev_page"), 1)
            .otherwise(0)).as("nonmono"),
          max(when(col("is_last"), col("page_end"))).as("last_chunk_page"))
          .agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum("np").cast("long").as("total_pages"),
            sum("unmapped").cast("int").as("n_unmapped"),
            sum("nonmono").cast("int").as("n_nonmonotone"),
            sum(when(col("last_chunk_page") === col("np"), 1).otherwise(0))
              .cast("long").as("docs_last_page_reached"))
      },
      Some("""WITH p AS (
        |  SELECT doc_id,
        |    GREATEST(1, CAST(ceil(COALESCE(length(text), 0) / 200.0) AS BIGINT)) AS np
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(np) AS BIGINT) AS total_pages,
        |  0 AS n_unmapped, 0 AS n_nonmonotone,
        |  CAST(count(*) AS BIGINT) AS docs_last_page_reached
        |FROM p""".stripMargin))
  )

  /** m06's raw canonical output (binary ingest → full A1→A14 pipeline →
    * canonical rows, vector as dim+L2 digest) — the frame the declared
    * query digests, shared with GoldenChunksGen/Spec so the byte-level
    * golden-parquet backstop pins exactly what the digest folds.
    */
  private[graft] def m06Canonical(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        col("source"))
    val pages = DocExtract.extractPages(s, docs)
    val assembled = DocExtract.assembleWithOcr(s, pages)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("document_text").as("text"),
        lit("und").as("lang"), col("source"),
        length(col("document_text")).cast("long").as("n_chars"))
    vectorDigest(graft.operators.Ingest.pipeline(s, assembled))
  }

  /** m04's pinned corpus digests, keyed by fixture document count —
    * same recipe + drift contract as PipelineQueries.GoldenD08.
    */
  private val GoldenM04: Map[Long, Seq[String]] = Map(
    500L -> Seq("646, 500, 5444003693352786898"),
    5000L -> Seq("6440, 5000, -2791939972946292199"))

  /** m06's pinned full-canonical-row corpus digests (binary-ingest
    * composition), same key + recipe as PipelineQueries.GoldenD10.
    */
  private val GoldenM06: Map[Long, Seq[String]] = Map(
    500L -> Seq("640, 640, 5622015880296669731"),
    5000L -> Seq("6356, 6356, 5426002302470608462"))
}
