package graft.operators

import graft.schemas.{Chunk, Doc}
import graft.text.{Chunker, TextKernel}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's whole program as one declarative Spark pipeline
  * (SURVEY.md §3 EP1):
  *
  *   documents → normalize (A7) → chunk (A8, flatMap — narrow, no shuffle)
  *     → md5 (A9) → exact dedup BEFORE embedding (A12; §4 reorder — the
  *     reference pays for the embedding first, main.py:297 vs db_utils.py:135)
  *     → embed per partition (A11) → canonical projection (A13) → sink (A14).
  *
  * Scale notes (100 TB): chunking and embedding are narrow maps — they scale
  * with input partitions and never shuffle. The only shuffle is the dedup
  * exchange on `text_hash` (32-byte key, uniformly distributed — no skew).
  * Cross-load dedup against an existing store is a left-anti join on the same
  * key; with both sides bucketed by `text_hash` it is shuffle-free.
  */
object Ingest {

  /** Normalize + chunk each document into canonical chunk rows. Pure flatMap:
    * one input row → N chunk rows, no state, no shuffle.
    */
  def chunkDocuments(spark: SparkSession, docs: DataFrame): Dataset[Chunk] = {
    import spark.implicits._
    // NOT spread (ScaleOps.spread): the splitter is a cheap linear scan and
    // its input is the text payload itself — an added exchange moves every
    // byte once for no CPU win (measured regressions on d08/d09/m06)
    docs.select("doc_id", "text", "lang", "source", "n_chars").as[Doc].flatMap { d =>
      Chunker.chunkWithOffsets(d.text).zipWithIndex.map { case ((content, st, en), i) =>
        Chunk(
          // ref builds sanitize_key(f"{file}_{i}") (main.py:309); doc_id added
          // because our corpus has many docs per source file.
          id = TextKernel.sanitizeKey(s"${d.source}_${d.doc_id}_$i"),
          content = content,
          filename = d.source,
          chunk_id = i,
          text_hash = TextKernel.md5Hex(content),
          // ref stores chunk_id+1 here (main.py:305 — a provenance bug we
          // reproduce only in shape; true page numbers don't exist for text docs)
          page_number = i + 1,
          // TRUE provenance: offsets into normalize(text) — d16's predicate
          start_off = st,
          end_off = en)
      }
    }
  }

  /** Exact dedup with a deterministic first-arrival survivor (A12; SURVEY §7
    * hard-part 3): `row_number` over the hash ordered by provenance — not
    * `dropDuplicates`, whose surviving row is partition-order dependent and
    * would make oracle hash-compares flaky.
    */
  def dedupExactDeterministic(chunks: DataFrame, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("text_hash")).orderBy(orderCols.map(col): _*)
    chunks.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Cross-load dedup: drop rows whose `text_hash` already exists in the
    * store (reference queries the index per chunk, db_utils.py:135-146; here
    * one distributed anti-join instead of N lookups).
    */
  def dedupAgainstExisting(fresh: DataFrame, existing: DataFrame): DataFrame =
    fresh.join(existing.select("text_hash").distinct(), Seq("text_hash"), "left_anti")

  /** Bloom-prefiltered cross-load dedup — same RESULT as
    * [[dedupAgainstExisting]] (exact, duplicate-preserving), different
    * shuffle profile. The anti-join above shuffles the ENTIRE fresh load on
    * `text_hash` even when 99% of rows are genuinely new (the common case
    * for an append-mostly corpus). Here the existing hashes are folded ONCE
    * into a bloom bitmask of mBits bits packed into mBits/64 longs — sized
    * by filter GEOMETRY, not data (2^20 bits = 128 KiB) — and every fresh
    * row tests its k row-local hash positions against the mask with pure
    * Catalyst bit arithmetic (codegen, no UDF, no shuffle): any unset
    * position proves the row new (bloom filters have no false negatives),
    * so only the candidate sliver (true-dup rate + fp rate) pays the exact
    * verification anti-join. False positives cost extra verification, never
    * wrong output — exactness is independent of (mBits, k), which the spec
    * drills by shrinking mBits until the filter saturates.
    *
    * This is the engine-level form of Spark's own runtime bloom pruning
    * (InjectRuntimeFilter), applied where the optimizer cannot see it:
    * across two separately-loaded corpora. Mask construction is a
    * map-side-combined word-index aggregation (≤ mBits/64 output rows,
    * collect bounded by geometry — same justification as the IVF centroid
    * sample); at 100 TB the mask rides task broadcast once while the fresh
    * side stays a narrow filter.
    */
  def bloomDedupAgainstExisting(fresh: DataFrame, existing: DataFrame,
                                mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0 && k > 0,
      s"bloom geometry: mBits must be a positive multiple of 64, got m=$mBits k=$k")
    // k independent hash functions: xxhash64 re-seeded by hashing the probe
    // index alongside the key (pure Catalyst, codegen; no UDF)
    def positions(h: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(k - 1)), i => pmod(xxhash64(h, i), lit(mBits.toLong)))
    // pack set bits into words: groupBy(word index) partial-aggregates
    // map-side; output cardinality ≤ mBits/64 regardless of corpus size
    val setWords = existing
      .select(explode(positions(col("text_hash"))).as("pos"))
      .select((col("pos") / 64).cast("long").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64)).cast("int")).as("b"))
      .groupBy("w").agg(call_function("bit_or", col("b")).as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val mask = Array.tabulate(mBits / 64)(i => setWords.getOrElse(i, 0L))
    val maskCol = typedLit(mask.toSeq)
    def bitSet(p: org.apache.spark.sql.Column) =
      element_at(maskCol, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64)).cast("int"))) =!= 0L
    val mayExist = forall(positions(col("text_hash")), bitSet)
    val definitelyNew = fresh.filter(!mayExist)
    val candidates = fresh.filter(mayExist)
    definitelyNew.unionByName(dedupAgainstExisting(candidates, existing))
  }

  /** Attach `content_vector` by embedding per partition (batched — §4). */
  def withEmbeddings(spark: SparkSession, chunks: Dataset[Chunk], embedder: Embedder): DataFrame = {
    import spark.implicits._
    // spread: embedding is the heaviest per-row kernel in the pipeline and
    // the upstream dedup typically leaves few (AQE-coalesced) partitions
    val embedded = ScaleOps.spread(chunks).mapPartitions { it =>
      it.map(c => (c, embedder.embed(c.content)))
    }
    embedded.select(
      col("_1.id").as("id"),
      col("_1.content").as("content"),
      col("_2").as("content_vector"),
      col("_1.filename").as("filename"),
      col("_1.chunk_id").as("chunk_id"),
      col("_1.text_hash").as("text_hash"),
      col("_1.page_number").as("page_number"))
  }

  /** Final canonical projection (A13): full 10-field chunk-store schema.
    * `ingestTime` is injected (not wall-clock) so outputs stay deterministic.
    */
  def toCanonical(df: DataFrame, fileType: String = "txt",
                  ingestTime: java.sql.Timestamp = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")): DataFrame = {
    val vec = if (df.columns.contains("content_vector")) col("content_vector")
              else lit(null).cast("array<float>")
    df.select(
      col("id"),
      col("content"),
      vec.as("content_vector"),
      col("filename"),
      col("chunk_id"),
      col("text_hash"),
      lit(ingestTime).as("timestamp"),
      lit(fileType).as("file_type"),
      col("page_number"),
      // same field set as the reference's metadata blob (main.py:300-306)
      to_json(struct(
        col("filename"), col("chunk_id"),
        lit(ingestTime).cast("string").as("timestamp"),
        col("text_hash"), col("page_number"))).as("metadata"))
  }

  /** Fallback doc key (A13 detail; reference db_utils.py:147-151): a row
    * arriving without a key gets sanitize("{filename}_{chunk_id}_{suffix}").
    * The reference's suffix is uuid4().hex[:6] — random. Random is wrong at
    * engine scale: re-ingesting the same chunk must regenerate the SAME
    * key, or first-arrival upserts (A14) and checkpoint replays stop being
    * idempotent. The engine takes the 6-hex suffix from the content md5
    * instead — same keyspace and collision behavior, stable across re-runs.
    */
  def withFallbackKey(df: DataFrame): DataFrame = {
    // coalesce BEFORE building the key: concat_ws silently skips nulls, so
    // a null filename would shift segments and a null content would drop
    // the disambiguating suffix (letting same-(filename, chunk_id) rows
    // collide) — empty-string defaults keep the key shape fixed
    val fb = regexp_replace(
      concat_ws("_",
        coalesce(col("filename"), lit("")),
        coalesce(col("chunk_id").cast("string"), lit("")),
        substring(md5(coalesce(col("content"), lit(""))), 1, 6)),
      "[^a-zA-Z0-9_\\-=]", "_")
    df.withColumn("id",
      when(col("id").isNull || length(col("id")) === 0, fb).otherwise(col("id")))
  }

  /** Snapshot diff (CDC between two loads of a corpus): classify every key
    * as added / deleted / changed / unchanged by comparing content hashes
    * across a full-outer join on the key. One shuffle on the join key at
    * any scale (bucket both snapshots by the key to make it shuffle-free);
    * the status column drives incremental re-processing — only added ∪
    * changed need re-chunking/re-embedding, deleted drives store cleanup.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
                   keyCol: String, hashCol: String): DataFrame =
    prev.select(col(keyCol).as(keyCol), col(hashCol).as("__h_prev"))
      .join(cur.select(col(keyCol).as(keyCol), col(hashCol).as("__h_cur")),
        Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__h_prev").isNull, "added")
          .when(col("__h_cur").isNull, "deleted")
          .when(col("__h_prev") === col("__h_cur"), "unchanged")
          .otherwise("changed").as("status"))

  /** Dead-letter split (A22): classify rows once, route failures to a side
    * output instead of throwing — per-row errors never kill the job (the
    * reference wraps every chunk/file in try/except and counts failures,
    * main.py:291-346). Returns (good, dead) frames; `dead` carries a reason.
    */
  def withDeadLetter(docs: DataFrame): (DataFrame, DataFrame) = {
    val classified = docs.withColumn("__err",
      when(col("text").isNull, lit("null_text"))
        .when(length(trim(col("text"))) === 0, lit("empty_text"))
        .otherwise(lit(null)))
    (classified.filter(col("__err").isNull).drop("__err"),
      classified.filter(col("__err").isNotNull)
        .select(col("doc_id"), col("source"), col("__err").as("error")))
  }

  /** End-to-end pipeline (the flagship `SparkEntry.entry` path). */
  def pipeline(spark: SparkSession, docs: DataFrame,
               embedder: Embedder = new HashingEmbedder()): DataFrame = {
    val chunks = chunkDocuments(spark, docs)
    // NOT pre-repartitioned by text_hash (round-19 note): an explicit
    // REPARTITION_BY_NUM here satisfies the window's distribution and
    // pins embed-stage parallelism, but it REPLACES the planner's
    // exchange and with it the map-side Partial WindowGroupLimit — the
    // rank<=1 reduction that drops duplicate payloads BEFORE they cross
    // the wire, the pipeline's key shuffle saving at scale. Measured
    // locally ~0.5 s faster, rejected for the scale regression; the
    // planner's shape keeps Partial WGL and AQE's parallelismFirst
    // coalescing keeps the post-shuffle embed stage adequately split.
    val deduped = dedupExactDeterministic(chunks.toDF(), Seq("filename", "chunk_id", "id"))
    import spark.implicits._
    val withVec = withEmbeddings(spark, deduped.as[Chunk], embedder)
    toCanonical(withVec)
  }
}
