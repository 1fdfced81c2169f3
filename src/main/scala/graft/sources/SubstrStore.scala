package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once POSITIONAL anchor artifact for exact-substring deduplication
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better" — the ExactSubstr modality: verbatim spans of >= L tokens shared
  * ACROSS documents, beyond what shingle-set similarity measures). Same
  * lifecycle as [[ShingleStore]]: a real corpus maintains the anchor tables
  * at ingest and every substring-dedup query probes them instead of
  * re-running the tokenize→gram→hash pipeline per invocation.
  *
  * Where the paper builds a suffix array (impractical to maintain
  * incrementally over a distributed, append-only corpus), this artifact
  * keeps fixed-width anchors: every [[AnchorWords]]-word window of the
  * lowercased normalized text, at its 1-based word position. A window
  * shared by >= 2 documents marks its [[AnchorWords]] positions duplicated;
  * maximal runs of duplicated positions are exactly the shared spans of
  * >= AnchorWords words (a shared span of S >= W words contributes S-W+1
  * consecutive anchors covering all S positions — no span is missed, none
  * is overcounted).
  *
  * Artifact layout (each behind the [[Versioned]] pointer protocol):
  *   `rows` — (doc_id, n_words, pos, h): one row per anchor START, where
  *            `h = xxhash64(anchor text)`. Hashing the 8-word window to 64
  *            bits divides the posting payload by ~6x and makes the df
  *            join key fixed-width — the right trade at 100 TB (a random
  *            collision among 10^12 anchors is ~1e-14 per pair and could
  *            only mark a span duplicated, never hide one).
  *   `docs` — (doc_id, n_words): per-document token counts for EVERY
  *            non-empty document (including those shorter than the anchor
  *            width), so coverage queries never re-read the corpus text.
  *   `df`   — (h, df) for DUPLICATED anchors only (df >= 2), precomputed
  *            once per maintenance cycle (watermarked like ShingleStore's
  *            df — a crash between a rows append and the refresh is
  *            detected and self-repaired on the next read). Unique
  *            anchors dominate any real corpus (the table would otherwise
  *            be as large as the corpus word count), and every consumer
  *            filters df >= 2 anyway — storing only the dup side shrinks
  *            the artifact by orders of magnitude AND turns the
  *            anchors ⋈ df join's build side into a frame small enough
  *            that the planner broadcasts it (no shuffle of the anchor
  *            table at all; PlanSpec's x15 guard pins this), degrading
  *            gracefully to a sort-merge join only when the dup set is
  *            genuinely huge.
  *
  * At 100 TB: rows are written CLUSTERED by doc_id (PhysicalLayout
  * .writeSorted — each document's anchors co-located, tight doc_id
  * row-group ranges for per-doc provenance probes). Clustering by `h`
  * was measured and REJECTED: no declared query probes by h, and
  * h-ordering scatters each doc's anchors across partitions, which
  * destroys the partial-aggregation locality of the covered-position
  * distinct (measured at sf0.1: shuffle_rows 59.8k doc-clustered vs
  * 117k h-sorted — the partial distinct stops collapsing same-doc
  * duplicates before the exchange). The dup-only df broadcast keeps the
  * big table un-shuffled; the per-doc span windows partition by doc_id
  * (no global sort anywhere); and maintenance is append-only with cost
  * ∝ new documents. The DuckDB
  * oracles recompute anchors from `documents` as strings — the artifact
  * is a plan-level materialization, not a semantic change (modulo the
  * documented hash-collision odds).
  */
object SubstrStore {

  /** Anchor window width in words: a shared verbatim run of >= 8 words
    * (~50+ chars) counts as a duplicated span — the smallest width at
    * which boilerplate 3-grams stop dominating (at width 3 the synthetic
    * corpus is ~92% "duplicated"; at 8 the signal is the actual shared
    * passages: ~9% of docs).
    */
  val AnchorWords = 8

  /** Conf key overriding the artifact root (default: system tmpdir). */
  val RootConf = "spark.graft.substr.dir"

  def path(spark: SparkSession, sfDir: String): String = {
    val root = spark.conf.getOption(RootConf)
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_substr")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      PhysicalLayout.sourceTag(sfDir, "documents")
    // v2: dup-only df table + h-sorted rows (round 10) — the layout
    // version in the path retires pre-change cached artifacts instead of
    // serving a stale full-df table through the idempotent ensure()
    s"$root/sub${AnchorWords}v2_$tag"
  }

  private def normBase(docs: DataFrame): DataFrame = {
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    docs.select(col("doc_id"), norm.as("norm"))
      .filter(length(col("norm")) > 0)
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("n_words", size(col("toks")))
  }

  /** (doc_id, n_words) for every non-empty document — pure Catalyst. */
  def docRowsOf(docs: DataFrame): DataFrame =
    normBase(docs).select(col("doc_id"), col("n_words"))

  /** (doc_id, n_words, pos, h) positional anchor rows — pure Catalyst
    * (codegen): docs shorter than [[AnchorWords]] tokens contribute no
    * anchors (substring dedup of tiny documents is exact dedup's job);
    * `pos` is the 1-based word position of the window start.
    */
  def anchorRowsOf(docs: DataFrame): DataFrame =
    anchorsFromBase(normBase(docs))

  private def anchorsFromBase(base: DataFrame): DataFrame = {
    val w = AnchorWords
    base
      .filter(col("n_words") >= w)
      .select(col("doc_id"), col("n_words"),
        posexplode(transform(sequence(lit(1), col("n_words") - (w - 1)), i =>
          xxhash64(concat_ws(" ", slice(col("toks"), i, lit(w))))))
          .as(Seq("pos0", "h")))
      .select(col("doc_id"), col("n_words"),
        (col("pos0") + 1).as("pos"), col("h"))
  }

  /** [[spanStats]] computed FRESH from any (doc_id, text) frame with the
    * one-scan discipline: the normalized base is checkpointed once (it
    * feeds both the anchors and the per-doc word counts) and the anchors
    * once (they feed both the df aggregation and the coverage join) —
    * without the checkpoints Catalyst re-runs the corpus scan + tokenize
    * per consumer, three passes in all. Store-backed corpora probe the
    * persisted tables instead (x15's path).
    */
  def freshStats(docs: DataFrame): DataFrame = {
    val base = graft.operators.ScaleOps.checkpointed(normBase(docs))
    val anchors = graft.operators.ScaleOps.checkpointed(anchorsFromBase(base))
    spanStats(anchors,
      base.select(col("doc_id"), col("n_words")),
      anchors.groupBy("h").agg(countDistinct(col("doc_id")).as("df")))
  }

  /** Build the artifact from any (doc_id, text) frame into `dir`. */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit =
    Versioned.withWriterLease(dir) {
      Versioned.publish(dir, "rows", -1L) { v =>
        PhysicalLayout.writeSorted(anchorRowsOf(docs), "doc_id", v)
      }
      Versioned.publish(dir, "docs", -1L) { v =>
        docRowsOf(docs).write.parquet(v)
      }
      refreshDf(spark, dir)
      Versioned.metaBackend.createMarker(s"$dir/_SUCCESS")
    }

  /** Idempotent build over the `documents` fixture (first caller pays one
    * corpus pass; later callers in any JVM read the published parquet).
    */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val p = path(spark, sfDir)
    PhysicalLayout.ensureDir(p) { tmp =>
      build(spark, Tables.load(spark, sfDir, "documents"), tmp)
    }
    p
  }

  /** Current anchor rows at an explicit path, tombstones applied. */
  def rowsAt(spark: SparkSession, path: String): DataFrame =
    Tombstones.applyTo(spark, path,
      Versioned.read(spark, path, "rows"), "doc_id")

  /** Current per-doc word counts at an explicit path, tombstones applied. */
  def docsAt(spark: SparkSession, path: String): DataFrame =
    Tombstones.applyTo(spark, path,
      Versioned.read(spark, path, "docs"), "doc_id")

  /** Current df table (DUPLICATED anchors only, df >= 2), watermark-checked
    * against the rows footer count
    * (the ShingleStore.dfAt protocol: a crash between a rows append and
    * the df refresh is repaired by one pass over persisted rows).
    */
  def dfAt(spark: SparkSession, path: String): DataFrame = {
    // fingerprint-cached count (RowCountCache, the ShingleStore.dfAt note)
    val base = RowCountCache.countFor(path, "rows") {
      rowsAt(spark, path).count()
    }
    if (!Versioned.readPointer(path, "df").exists(_.watermark == base))
      try refreshDf(spark, path)
      catch {
        case _: Versioned.ConcurrentWriterException => ()
      }
    Versioned.read(spark, path, "df")
  }

  /** The persisted positional anchor rows over the fixture. */
  def rows(spark: SparkSession, sfDir: String): DataFrame =
    rowsAt(spark, ensure(spark, sfDir))

  /** The persisted (doc_id, n_words) table over the fixture. */
  def docTable(spark: SparkSession, sfDir: String): DataFrame =
    docsAt(spark, ensure(spark, sfDir))

  /** The persisted (h, df) dup-anchor (df >= 2) frequency table over the
    * fixture.
    */
  def dfTable(spark: SparkSession, sfDir: String): DataFrame =
    dfAt(spark, ensure(spark, sfDir))

  /** INCREMENTAL maintenance, ShingleStore.append's contract: append
    * anchors + doc rows for documents not yet present (idempotent under
    * redelivery), then refresh df from the artifact itself. Append-only
    * corpus contract; changed documents route through delete + append.
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame,
             deferDerived: Boolean = false): Unit =
    Versioned.withWriterLease(path) {
      if (Versioned.readPointer(path, "rows").isEmpty) {
        build(spark, newDocs, path)
        return
      }
      val curRows = Versioned.readPointer(path, "rows").get.dir
      val curDocs = Versioned.readPointer(path, "docs").get.dir
      // RAW read for the existing-check: a tombstoned id counts as present,
      // so a deleted doc cannot be re-appended before a compact clears it
      val existing = spark.read.parquet(s"$path/$curDocs")
        .select("doc_id").distinct()
      val fresh = newDocs.join(existing, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      anchorRowsOf(fresh).write.mode("append").parquet(s"$path/$curRows")
      docRowsOf(fresh).write.mode("append").parquet(s"$path/$curDocs")
      if (!deferDerived) refreshDf(spark, path)
    }

  /** DELETE documents: tombstone ids (visible immediately, cost ∝ deleted
    * ids); df realigns via the checked read or eagerly now.
    */
  def delete(spark: SparkSession, path: String, docIds: DataFrame,
             eager: Boolean = true): Unit =
    Versioned.withWriterLease(path) {
      Tombstones.add(spark, path, docIds)
      if (eager) refreshDf(spark, path)
    }

  /** Per-document duplicated-span statistics from anchor/df/doc frames —
    * the exact-substring-dedup computation itself (x15's engine side and
    * the Graft.duplicatedSpans facade): anchors with df >= 2 expand to
    * their covered word positions (bounded ×AnchorWords explode over DUP
    * anchors only), maximal spans fall out of one per-doc
    * gaps-and-islands window, and every non-empty doc gets a row
    * (zeros when nothing is duplicated). Output: (doc_id, n_words,
    * dup_words, n_spans, max_span_words, dup_frac).
    */
  def spanStats(anchorRows: DataFrame, docRows: DataFrame,
                dfTable: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = AnchorWords
    val dup = anchorRows.join(dfTable.filter(col("df") >= 2), Seq("h"))
    val cov = dup.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("p"))
      .distinct()
    val isl = cov.withColumn("grp",
      col("p") - row_number().over(
        Window.partitionBy("doc_id").orderBy("p")))
    val spans = isl.groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("span_len"))
    val agg = spans.groupBy("doc_id").agg(
      sum("span_len").as("dup_words"),
      count(lit(1)).as("n_spans"),
      max("span_len").as("max_span_words"))
    docRows.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span_words"), lit(0L)).as("max_span_words"),
        round(coalesce(col("dup_words"), lit(0L)) /
          col("n_words").cast("double"), 6).as("dup_frac"))
  }

  /** Small-file compaction for the anchor rows table + the tiny docs
    * sidecar (the ShingleStore.compactRows contract: atomic re-point,
    * pending tombstones applied physically then cleared, df untouched).
    */
  def compactRows(spark: SparkSession, path: String, partitions: Int = 4): Unit =
    Versioned.withWriterLease(path) {
      val rows = rowsAt(spark, path)
      val docs = docsAt(spark, path)
      Versioned.publish(path, "rows", -1L) { v =>
        PhysicalLayout.writeSorted(rows, "doc_id", v, partitions = partitions)
      }
      Versioned.publish(path, "docs", -1L) { v =>
        docs.coalesce(1).write.parquet(v)
      }
      Tombstones.clear(spark, path)
    }

  /** Self-scheduling compaction (one driver-side file-count check). */
  def compactRowsIfNeeded(spark: SparkSession, path: String,
                          maxFiles: Int = 16, partitions: Int = 4): Boolean = {
    val fragmented = Versioned.partFileCount(path, "rows") > maxFiles
    if (fragmented) compactRows(spark, path, partitions)
    fragmented
  }

  private[sources] def refreshDf(spark: SparkSession, path: String): Unit =
    Versioned.withWriterLease(path) {
      val rows = rowsAt(spark, path)
      Versioned.publish(path, "df", rows.count()) { v =>
        // dup anchors only (df >= 2) — see the layout scaladoc: consumers
        // never read unique anchors, and dropping them is what keeps this
        // table broadcast-sized at any corpus scale
        rows.groupBy("h").agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 2)
          .write.parquet(v)
      }
    }
}
