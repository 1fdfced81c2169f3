package graft.queries

import graft.operators.{HashingEmbedder, Ingest, Metrics}
import graft.schemas.Schemas
import graft.text.TextKernel
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's ingestion surface as declarative queries over `documents`
  * (SURVEY.md §2.A): normalize (A7), hash (A9), key sanitization (A10), exact
  * dedup (A12), chunking (A8), canonical projection (A13), count/facet stats
  * (A15/A16). SQL-expressible steps carry DuckDB oracles; the chunker is
  * checked by golden/property unit tests and rows-only here.
  */
object PipelineQueries extends QuerySet {

  def queries: Seq[Q] = Seq(

    Q("d01_normalize",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), normCol.as("norm_text"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, $normSql AS norm_text FROM documents ORDER BY doc_id")),

    Q("d02_content_hash",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          md5(normCol).as("text_hash"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, md5($normSql) AS text_hash FROM documents ORDER BY doc_id")),

    Q("d03_sanitize_key",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          regexp_replace(concat(col("source"), lit("/"), col("doc_id"), lit(".txt")),
            "[^a-zA-Z0-9_\\-=]", "_").as("doc_key"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, regexp_replace(source || '/' || CAST(doc_id AS VARCHAR) || '.txt', " +
        "'[^a-zA-Z0-9_\\-=]', '_', 'g') AS doc_key FROM documents ORDER BY doc_id")),

    // Deterministic first-arrival survivor (A12; SURVEY §7 hard-part 3).
    Q("d04_exact_dedup",
      (s, d) => {
        val hashed = t(s, d, "documents").select(col("doc_id"),
          md5(normCol).as("text_hash"))
        val w = Window.partitionBy("text_hash").orderBy("doc_id")
        hashed.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn").orderBy("doc_id")
      },
      Some(s"""WITH h AS (SELECT doc_id, md5($normSql) AS text_hash FROM documents)
        |SELECT doc_id, text_hash FROM (
        |  SELECT doc_id, text_hash, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn FROM h)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    Q("d05_dedup_stats",
      (s, d) => {
        val hashed = t(s, d, "documents")
          .select(md5(normCol).as("text_hash"))
        hashed.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text_hash")).as("n_unique"),
          (count(lit(1)) - countDistinct(col("text_hash"))).as("n_dupes"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(DISTINCT md5($normSql)) AS BIGINT) AS n_unique,
        | CAST(count(*) - count(DISTINCT md5($normSql)) AS BIGINT) AS n_dupes
        |FROM documents""".stripMargin)),

    // A16 facet-by-filename analog.
    Q("d06_source_facet",
      (s, d) => t(s, d, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          countDistinct("lang").as("n_langs"))
        .orderBy("source"),
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // A15 count(*) + A16 distinct-file count in one row.
    Q("d07_index_stats",
      (s, d) => t(s, d, "documents")
        .agg(count(lit(1)).as("total_count"), countDistinct("source").as("n_files")),
      Some("SELECT CAST(count(*) AS BIGINT) AS total_count, " +
        "CAST(count(DISTINCT source) AS BIGINT) AS n_files FROM documents")),

    // A8 chunker output, HASH-GATED as a corpus digest: the chunker itself
    // is not SQL-expressible (recursive separator descent), so the oracle
    // is the GOLDEN-VALUES pattern — the digest of every chunk's
    // (id, content, start_off, end_off), xor-folded order-independently,
    // pinned as a literal per fixture corpus and selected by corpus size.
    // The pinned values come from the round-9 engine, whose chunker is
    // behaviorally pinned by ChunkerSpec's 852-case parity suite +
    // ChunkerPropertySpec; any later chunker/offset regression flips the
    // digest and fails the driver gate (previously this was a rows-only
    // check). An UNPINNED corpus yields an empty oracle result — a loud
    // rows_match failure, never a silent pass.
    Q("d08_chunks",
      (s, d) => Ingest.chunkDocuments(s, t(s, d, "documents")).toDF()
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("text_hash")).as("n_unique_hashes"),
          expr("bit_xor(xxhash64(id, content, start_off, end_off))")
            .as("chunks_digest")),
      Some(goldenBySize("n_chunks BIGINT, n_unique_hashes BIGINT, chunks_digest BIGINT",
        GoldenD08))),

    // Per-source chunk statistics, hash-gated by the same golden-VALUES
    // pattern as d08 (one literal row per (corpus, source)).
    Q("d09_chunk_stats",
      (s, d) => Ingest.chunkDocuments(s, t(s, d, "documents")).toDF()
        .groupBy("filename")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct("text_hash").as("n_unique_chunks"),
          max(length(col("content"))).as("max_chunk_len"))
        .orderBy("filename"),
      Some(goldenBySize(
        "filename VARCHAR, n_chunks BIGINT, n_unique_chunks BIGINT, max_chunk_len INT",
        GoldenD09) + "\nORDER BY filename")),

    // Full A1→A14 pipeline to the canonical 10-field chunk store, HASH-
    // GATED: every field of every canonical row (vector as dim + L2
    // digest — see QuerySet.vectorDigest; the injected deterministic
    // timestamp as a string) xor-folds into one corpus digest, pinned per
    // fixture corpus by the d08 golden-VALUES pattern. This closes the
    // last rows-only gap on the pipeline side — the driver now hash-gates
    // the composed A1→A14 output instead of only counting it; the
    // byte-level raw dump stays pinned in GoldenChunksSpec (golden
    // parquet at both SFs).
    Q("d10_ingest_canonical",
      (s, d) => d10Canonical(s, d)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("id")).as("n_unique_ids"),
          canonicalDigest.as("canonical_digest")),
      Some(goldenBySize(
        "n_rows BIGINT, n_unique_ids BIGINT, canonical_digest BIGINT",
        GoldenD10))),

    // Fallback doc-key generation (reference db_utils.py:147-151) over
    // keyless rows: sanitize(filename_chunkid_suffix) with the 6-hex
    // suffix taken from the content md5 — deterministic where the
    // reference uses uuid4 (see Ingest.withFallbackKey). Exercised here on
    // the documents table shaped as keyless chunk rows so the oracle can
    // recompute every key exactly.
    Q("d11_fallback_key",
      (s, d) => Ingest.withFallbackKey(
          t(s, d, "documents").select(
            lit(null).cast("string").as("id"),
            normCol.as("content"),
            col("source").as("filename"),
            col("doc_id").as("chunk_id")))
        .select(col("filename"), col("chunk_id"), col("id").as("doc_key"))
        .orderBy("filename", "chunk_id"),
      Some(s"""SELECT source AS filename, doc_id AS chunk_id,
        | regexp_replace(
        |   source || '_' || CAST(doc_id AS VARCHAR) || '_' || substr(md5($normSql), 1, 6),
        |   '[^a-zA-Z0-9_\\-=]', '_', 'g') AS doc_key
        |FROM documents ORDER BY filename, chunk_id""".stripMargin)),

    // Snapshot diff (CDC between loads): two modulo-derived snapshots of
    // the corpus — doc_id % 5 != 0 is the previous load, % 7 != 0 the
    // current one, and % 11 == 0 rows are "edited" in the current load —
    // classified added/deleted/changed/unchanged by hash compare across a
    // full-outer join (Ingest.snapshotDiff). The status column is what an
    // incremental 100 TB pipeline re-processes by: only added+changed are
    // re-chunked/re-embedded.
    Q("d12_snapshot_diff",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), normCol.as("norm"))
        val prev = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), md5(col("norm")).as("text_hash"))
        val cur = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 11 === 0, concat(col("norm"), lit(" v2")))
              .otherwise(col("norm"))).as("text_hash"))
        Ingest.snapshotDiff(prev, cur, "doc_id", "text_hash").orderBy("doc_id")
      },
      Some(s"""WITH docs AS (SELECT doc_id, $normSql AS norm FROM documents),
        |prev AS (
        |  SELECT doc_id, md5(norm) AS h FROM docs WHERE doc_id % 5 <> 0),
        |cur AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN norm || ' v2' ELSE norm END) AS h
        |  FROM docs WHERE doc_id % 7 <> 0)
        |SELECT coalesce(prev.doc_id, cur.doc_id) AS doc_id,
        |  CASE WHEN prev.h IS NULL THEN 'added'
        |       WHEN cur.h IS NULL THEN 'deleted'
        |       WHEN prev.h = cur.h THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id
        |ORDER BY doc_id""".stripMargin)),

    // Strided token-window chunking (size 64, stride 32): the fixed-size
    // overlapping training windows an LLM pipeline cuts AFTER curation —
    // complementary to the char-based recursive chunker (A8, d08) and to
    // x08's non-overlapping dedup passages. Pure narrow map (sequence →
    // transform → explode, all codegen), no shuffle before the final sort;
    // at 100 TB the row multiplier is ~2n/64 windows per n-token doc,
    // produced without any exchange. Window text is emitted as md5 so the
    // oracle pins the exact content, not just counts.
    Q("d13_token_windows",
      (s, d) => graft.operators.Curation
        // SHARED window builder (also behind Graft.tokenWindows) — empty/
        // whitespace docs are excluded BEFORE the split (split("", " ") is
        // [""], so a post-split size guard would pass a phantom window)
        .tokenWindows(t(s, d, "documents"), "doc_id", "text", size = 64, stride = 32)
        .select(col("id").as("doc_id"), col("win_id"), col("n_win_tokens"),
          md5(col("window_text")).as("win_hash"))
        .orderBy("doc_id", "win_id"),
      Some(s"""WITH docs AS (
        |  SELECT doc_id, string_split(lower(norm), ' ') AS toks
        |  FROM (SELECT doc_id, $normSql AS norm FROM documents)
        |  WHERE norm <> ''),
        |w AS (
        |  SELECT doc_id, len(toks) AS n, toks,
        |    unnest(range(0, CAST(floor((len(toks) - 1) / 32) AS BIGINT) + 1)) AS j
        |  FROM docs)
        |SELECT doc_id, CAST(j AS INT) AS win_id,
        | CAST(least(64, n - j * 32) AS INT) AS n_win_tokens,
        | md5(array_to_string(toks[j*32+1 : j*32+64], ' ')) AS win_hash
        |FROM w ORDER BY doc_id, win_id""".stripMargin)),

    // A11 embedding stage, HASH-CHECKED (closes the d10 rows-only hole at
    // its root): the feature-hashing embedder's PRE-normalization bucket
    // counts are integer-exact and built from the engine-portable md5 token
    // hash (TextKernel.md5Hash32 — the x04/x05 signature-oracle pattern), so
    // DuckDB recomputes every signed count independently. Per doc: the md5
    // digest of the sorted "bucket:count" pairs (pins the ENTIRE sparse
    // vector), nonzero-bucket count, total |count| mass, and a norm flag
    // checking the post-normalization L2 is 1 (or 0 for token-free docs) —
    // a broken tokenizer, hash, bucket map, sign rule, or normalizer each
    // breaks a different column. Narrow mapPartitions, no shuffle before
    // the final sort: the 100 TB embedding plan shape.
    Q("d14_embed_buckets",
      (s, d) => {
        import s.implicits._
        val emb = new HashingEmbedder()
        graft.operators.ScaleOps.spread(
          t(s, d, "documents").select(col("doc_id"), col("text"))
            .as[(Long, String)])
          .mapPartitions { it =>
            it.map { case (id, tx) =>
              val counts = emb.rawBucketCounts(tx)
              val nz = counts.zipWithIndex.filter(_._1 != 0) // ascending idx
              val digest = TextKernel.md5Hex(
                nz.map { case (c, i) => s"$i:$c" }.mkString(","))
              val sumAbs = nz.iterator.map(p => math.abs(p._1).toLong).sum
              val vec = emb.embed(tx)
              val l2 = math.sqrt(vec.iterator.map(x => x.toDouble * x).sum)
              val normOk =
                if (nz.nonEmpty) math.abs(l2 - 1.0) < 1e-3 else l2 == 0.0
              (id, nz.length, sumAbs, digest, if (normOk) 1 else 0)
            }
          }
          .toDF("doc_id", "n_nonzero", "sum_abs", "bucket_digest", "norm_ok")
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (
        |  SELECT doc_id, lower($normSql) AS norm FROM documents),
        |tk AS (
        |  SELECT doc_id, unnest(string_split(norm, ' ')) AS tok
        |  FROM n WHERE norm <> ''),
        |h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h FROM tk),
        |b AS (
        |  SELECT doc_id, CAST((h // 2) % ${Schemas.VectorDimensions} AS INT) AS idx,
        |    CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM h),
        |nz AS (
        |  SELECT doc_id, idx, CAST(sum(sgn) AS INT) AS cnt
        |  FROM b GROUP BY doc_id, idx HAVING sum(sgn) <> 0),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_nonzero,
        |    CAST(sum(abs(cnt)) AS BIGINT) AS sum_abs,
        |    md5(string_agg(CAST(idx AS VARCHAR) || ':' || CAST(cnt AS VARCHAR),
        |      ',' ORDER BY idx)) AS bucket_digest
        |  FROM nz GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_nonzero, 0) AS n_nonzero,
        | coalesce(a.sum_abs, 0) AS sum_abs,
        | coalesce(a.bucket_digest, md5('')) AS bucket_digest,
        | 1 AS norm_ok
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // A19 running stats as a DECLARED, oracle-checked query: the reference
    // prints driver-side counters after ingest (main.py:371-393); the
    // engine's equivalent is Dataset.observe (Metrics.observeIngest) —
    // metrics ride the job on the executors, zero extra passes. Here the
    // observed frame is the documents corpus shaped as canonical chunk rows
    // (content = normalized text, vector from the embedder), the action
    // runs, and the OBSERVATION'S OWN VALUES are returned as the result row
    // — so the oracle grades exactly what a pipeline operator would read
    // from the Observation, not a parallel re-aggregation.
    Q("d15_ingest_metrics",
      (s, d) => {
        import s.implicits._
        val emb = new HashingEmbedder()
        // checkpoint: TWO consumers (the observed count and the exact
        // countDistinct saturation guard) would otherwise each re-run the
        // embed kernel over the corpus
        val withVec = graft.operators.ScaleOps.checkpointed(
          graft.operators.ScaleOps.spread(
          t(s, d, "documents")
            .select(col("doc_id"), normCol.as("content"), col("source").as("filename"))
            .as[(Long, String, String)])
          .mapPartitions { it =>
            it.map { case (id, content, fn) => (id, content, fn, emb.embed(content)) }
          }
          .toDF("doc_id", "content", "filename", "content_vector"))
        val (observed, obs) = Metrics.observeIngest(withVec)
        observed.count() // the action that populates the observation
        val m = obs.get
        val nFiles = m("n_files").asInstanceOf[Long]
        // Saturation guard (the k02 discipline): the oracle compares the
        // HLL++ estimate byte-for-byte against exact COUNT(DISTINCT),
        // which only holds while the sketch stays in its sparse (exact)
        // regime. If a fixture ever pushes it out, fail loudly here with
        // the estimator named, instead of a confusing one-cell hash diff.
        val exactFiles = withVec.select(countDistinct("filename")).head().getLong(0)
        require(exactFiles == nFiles,
          s"approx_count_distinct(rsd=0.005) left its exact regime: " +
            s"estimate $nFiles vs exact $exactFiles distinct files — " +
            "d15's n_files needs a tolerance instead of a hash compare")
        Seq((m("n_chunks").asInstanceOf[Long], nFiles,
          m("n_zero_vectors").asInstanceOf[Long], m("total_chars").asInstanceOf[Long]))
          .toDF("n_chunks", "n_files", "n_zero_vectors", "total_chars")
      },
      // n_files: observe cannot use exact COUNT(DISTINCT) (disallowed in
      // metrics), so the engine reports approx_count_distinct — exact in
      // HLL++ sparse mode at fixture cardinalities (20 sources), hence
      // safely hash-comparable against the oracle's exact distinct here.
      // n_zero_vectors: the hashing embedder emits the zero vector exactly
      // for token-free content (the reference's error-fallback semantics).
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(count(DISTINCT source) AS BIGINT) AS n_files,
        | CAST(sum(CASE WHEN $normSql = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vectors,
        | CAST(sum(length($normSql)) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin)),

    // TRUE CHUNK PROVENANCE (A8 + SURVEY §1.2's own unfixed note): the
    // chunker now carries (start_off, end_off) into the normalized
    // document (Chunker.chunkWithOffsets; the reference stores
    // page_number = chunk_id + 1 instead — main.py:305). The offsets make
    // part of the rows-only chunker chain HASH-GATED through plain-SQL
    // invariants the oracle recomputes from `documents` alone:
    //   - every non-empty-normalized doc produces chunks (docs_chunked),
    //   - every such doc is FULLY COVERED: first chunk starts at offset 1,
    //     last chunk ends at length(norm)+1 (docs_fully_covered),
    //   - substr(norm, start_off, end_off - start_off) = content for EVERY
    //     chunk (n_inconsistent = 0 — the consistency predicate itself),
    //   - inter-chunk gaps contain only stripped whitespace (n_bad_gaps =
    //     0 — chunk boundaries lose nothing but spaces),
    //   - adjacent-chunk overlap never exceeds CHUNK_OVERLAP = 100
    //     (n_overlap_violations = 0),
    //   - no chunk exceeds CHUNK_SIZE = 400 (n_oversize = 0).
    // A wrong offset ANYWHERE in the corpus breaks coverage, consistency,
    // or the gap audit, so the hash compare pins the whole offset map even
    // though DuckDB cannot run the chunker itself.
    Q("d16_chunk_provenance",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val docs = t(s, d, "documents")
        val chunks = docs.select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, tx) =>
            graft.text.Chunker.chunkWithOffsets(tx).zipWithIndex.map {
              case ((c, st, en), i) => (id, i, c, st, en)
            }
          }
          .toDF("doc_id", "chunk_id", "content", "start_off", "end_off")
        val norms = docs.select(col("doc_id"), normCol.as("norm"))
        val nDocs = norms.filter(col("norm") =!= "").count()
        val w = Window.partitionBy("doc_id").orderBy("chunk_id")
        val nav = chunks.join(norms, "doc_id")
          .withColumn("ok",
            expr("substr(norm, start_off, end_off - start_off) = content"))
          .withColumn("prev_end", lag("end_off", 1).over(w))
          .withColumn("bad_gap", expr(
            "prev_end IS NOT NULL AND start_off > prev_end AND " +
              "trim(substr(norm, prev_end, start_off - prev_end)) <> ''"))
          .withColumn("overlap_violation",
            expr("prev_end IS NOT NULL AND prev_end - start_off > 100"))
        val perDoc = nav.groupBy("doc_id").agg(
          min("start_off").as("mn"), max("end_off").as("mx"),
          first(length(col("norm"))).as("norm_len"),
          sum(when(!col("ok"), 1).otherwise(0)).as("bad"),
          sum(when(col("bad_gap"), 1).otherwise(0)).as("gaps"),
          sum(when(col("overlap_violation"), 1).otherwise(0)).as("ovl"),
          sum(when(length(col("content")) > 400, 1).otherwise(0)).as("oversize"))
        perDoc.agg(
          count(lit(1)).as("docs_chunked"),
          sum(when(col("mn") === 1 && col("mx") === col("norm_len") + 1, 1)
            .otherwise(0)).as("docs_fully_covered"),
          sum("bad").as("n_inconsistent"),
          sum("gaps").as("n_bad_gaps"),
          sum("ovl").as("n_overlap_violations"),
          sum("oversize").as("n_oversize"))
          .select(lit(nDocs).as("n_docs"),
            col("docs_chunked").cast("long").as("docs_chunked"),
            col("docs_fully_covered").cast("long").as("docs_fully_covered"),
            col("n_inconsistent").cast("int").as("n_inconsistent"),
            col("n_bad_gaps").cast("int").as("n_bad_gaps"),
            col("n_overlap_violations").cast("int").as("n_overlap_violations"),
            col("n_oversize").cast("int").as("n_oversize"))
      },
      Some(s"""WITH nd AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE $normSql <> '')
        |SELECT n AS n_docs, n AS docs_chunked, n AS docs_fully_covered,
        | 0 AS n_inconsistent, 0 AS n_bad_gaps,
        | 0 AS n_overlap_violations, 0 AS n_oversize
        |FROM nd""".stripMargin))
  )

  /** d08's pinned corpus digests, keyed by fixture document count
    * (sf0.01 = 500 docs, sf0.1 = 5000) — regenerate with
    * `tools/golden_chunk_oracles.md`'s recipe after an INTENDED chunker
    * change; any unintended drift fails the driver gate.
    */
  private val GoldenD08: Map[Long, Seq[String]] = Map(
    500L -> Seq("646, 639, -8869728023756628100"),
    5000L -> Seq("6440, 6367, 3347215212891739754"))

  /** d10's raw canonical output (full A1→A14 pipeline to the canonical
    * store, vector as dim+L2 digest) — the frame the declared query
    * digests, shared with GoldenChunksGen/Spec so the byte-level
    * golden-parquet backstop pins exactly what the digest folds (the
    * m06Canonical contract).
    */
  private[graft] def d10Canonical(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame =
    vectorDigest(
      Ingest.pipeline(s, t(s, d, "documents"), new HashingEmbedder()))

  /** d10's pinned full-canonical-row corpus digests, same key + recipe
    * (GoldenGen prints them; regenerate only after an INTENDED change to
    * the chunker, embedder, or canonical projection).
    */
  private val GoldenD10: Map[Long, Seq[String]] = Map(
    500L -> Seq("639, 639, -5255039728369282928"),
    5000L -> Seq("6367, 6367, 5187865124372119781"))

  /** d09's pinned per-source chunk statistics, same key + recipe. */
  private val GoldenD09: Map[Long, Seq[String]] = Map(
    500L -> Seq(
      "'src0', 34, 34, 400", "'src1', 35, 35, 400", "'src10', 32, 32, 400",
      "'src11', 32, 32, 399", "'src12', 29, 29, 400", "'src13', 36, 36, 400",
      "'src14', 34, 34, 399", "'src15', 30, 30, 400", "'src16', 32, 32, 400",
      "'src17', 32, 32, 400", "'src18', 31, 31, 400", "'src19', 29, 29, 400",
      "'src2', 32, 32, 400", "'src3', 34, 34, 400", "'src4', 33, 33, 400",
      "'src5', 31, 31, 400", "'src6', 34, 34, 400", "'src7', 35, 35, 400",
      "'src8', 30, 30, 400", "'src9', 31, 31, 400"),
    5000L -> Seq(
      "'src0', 318, 318, 400", "'src1', 320, 320, 400",
      "'src10', 317, 317, 400", "'src11', 321, 321, 400",
      "'src12', 336, 336, 400", "'src13', 331, 331, 400",
      "'src14', 305, 305, 400", "'src15', 325, 325, 400",
      "'src16', 323, 323, 400", "'src17', 319, 319, 400",
      "'src18', 316, 316, 400", "'src19', 322, 322, 400",
      "'src2', 324, 324, 400", "'src3', 328, 328, 400",
      "'src4', 324, 324, 400", "'src5', 333, 333, 400",
      "'src6', 316, 316, 400", "'src7', 307, 307, 400",
      "'src8', 329, 329, 400", "'src9', 326, 326, 400"))
}
