package graft.queries

import graft.operators.{DocExtract, Multimodal}
import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

/** Multimodal + extraction surface (§2.A A2-A6, §2.C multimodal columns).
  * The fixture set has no binary media, so the payloads are synthesized from
  * document text (encode → binary) — the decode step is a stub either way
  * (no codecs in this container); the Spark plumbing (schema, per-partition
  * batching, narrow maps) is the real, tested artifact. Rows-only checks;
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
    Q("m01_media_features",
      (s, d) => Multimodal.extractFeatures(s, synthMedia(s, d))
        .select(col("media_id"), col("modality"), col("width"), col("height"),
          size(col("features")).as("n_dims"))
        .orderBy("media_id")),

    // Frame/window sampling plumbing (video-style 1→N narrow expansion).
    Q("m02_frame_sample",
      (s, d) => Multimodal.sampleFrames(s, synthMedia(s, d), everyK = 4)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), max("frame_idx").as("max_idx"))
        .orderBy("media_id")),

    // A2-A6: page extraction + conditional OCR + provenance-tagged assembly.
    Q("m03_extract_ocr_assemble",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
        val pages = DocExtract.extractPages(s, docs)
        DocExtract.assembleWithOcr(s, pages).orderBy("doc_id")
      }),

    // Resize plumbing: payload renormalized to the target pixel budget,
    // dims recorded in metadata (codec stubbed).
    Q("m05_resize",
      (s, d) => Multimodal.resize(s, synthMedia(s, d), targetW = 32, targetH = 32)
        .select(col("media_id"), col("width"), col("height"),
          length(col("content")).as("byte_len"))
        .orderBy("media_id")),

    // The reference's full EP1 lifecycle from bytes (SURVEY.md §3):
    // binary doc → pages (A2-A4) → conditional OCR + tagged assembly
    // (A5-A6) → normalize/chunk/hash (A7-A9) → dedup (A12) → embed (A11) →
    // canonical store rows (A13).
    Q("m06_e2e_binary_ingest",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
            col("source"))
        val pages = DocExtract.extractPages(s, docs)
        val assembled = DocExtract.assembleWithOcr(s, pages)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("doc_id"), col("document_text").as("text"),
            lit("und").as("lang"), col("source"),
            length(col("document_text")).cast("long").as("n_chars"))
        vectorDigest(graft.operators.Ingest.pipeline(s, assembled)).orderBy("id")
      }),

    // A8 via the SQL surface: LATERAL VIEW over the chunk_text Generator.
    Q("m04_chunks_sql",
      (s, d) => {
        GraftFunctions.register(s)
        t(s, d, "documents").createOrReplaceTempView("documents")
        s.sql("""SELECT doc_id, c.chunk_id, c.chunk
                |FROM documents
                |LATERAL VIEW chunk_text(text) c AS chunk_id, chunk
                |ORDER BY doc_id, chunk_id""".stripMargin)
      })
  )
}
