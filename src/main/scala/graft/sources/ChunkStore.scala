package graft.sources

import graft.schemas.Schemas
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The engine-side chunk store: idempotent declaration (A21 — the reference
  * runs create-or-update index DDL on every client init, db_utils.py:48,
  * 120-127) and merge-on-key writes (A14).
  *
  * Local builds use a parquet directory; at cluster scale the same calls
  * target a table format with transactional upsert — the API is the
  * boundary, not the storage.
  */
object ChunkStore {

  /** Idempotent "CREATE TABLE IF NOT EXISTS": ensures an empty store with
    * the canonical schema exists; re-running is a no-op (never truncates).
    */
  def ensure(spark: SparkSession, path: String): Unit = {
    val exists =
      try { spark.read.parquet(path).schema; true }
      catch { case _: Throwable => false }
    if (!exists) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.chunkStore)
        .write.mode(SaveMode.ErrorIfExists).parquet(path)
    }
  }

  /** A14 batch upsert: first-arrival merge on `keyCol` — rows whose key
    * already exists in the store are skipped (the reference's
    * skip-if-hash-exists insert, db_utils.py:131-146), new rows appended.
    * One anti-join instead of one lookup per row.
    *
    * `partitionBy` (e.g. `Seq("file_type")` or an ingest-date column) turns
    * the store into a hive-partitioned layout so downstream readers get
    * partition pruning — the 100 TB layout; empty = flat local layout. The
    * anti-join reads only the key column either way (column pruning).
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
             keyCol: String = "text_hash", partitionBy: Seq[String] = Nil): Unit = {
    // absent/empty store → everything is fresh (don't mix ensure()'s flat
    // empty marker into a partitioned layout)
    val existing =
      try Some(spark.read.parquet(path).select(keyCol).distinct())
      catch { case _: Throwable => None }
    val deduped = batch.dropDuplicates(keyCol)
    val fresh = existing.fold(deduped)(e => deduped.join(e, Seq(keyCol), "left_anti"))
    val writer = fresh
      .select(Schemas.chunkStore.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(path)
  }

  /** Tombstone anchor: a SIBLING of the store dir, not inside it — the
    * store path IS the parquet data directory (flat layout, files at the
    * top level), so a `tombstones/` subdirectory inside it would be
    * swept into every `spark.read.parquet(path)` listing as data. The
    * index/dedup stores don't have this problem (their tables live in
    * versioned SUBdirs of an artifact root, so the sidecar sits beside
    * the tables); here the sidecar gets its own sibling root.
    */
  private def tsAnchor(path: String): String = s"$path.ts"

  /** The LOGICAL store view: the physical table minus the [[Tombstones]]
    * sidecar [[delete]] writes. Readers that must see removals (serving,
    * exports, downstream pipelines) read through here; [[upsert]]'s
    * key anti-join deliberately keeps reading the PHYSICAL table, so a
    * deleted key cannot be re-upserted until a [[compact]] — the same
    * re-add-requires-compact contract as every other store's delete.
    */
  def read(spark: SparkSession, path: String, keyCol: String = "text_hash"): DataFrame =
    Tombstones.applyTo(spark, tsAnchor(path), spark.read.parquet(path), keyCol)

  /** DELETE chunks by key — the removal half of the A14 merge sink
    * (takedowns must propagate to the chunk store exactly like to every
    * derived index; the reference's own surface is insert-only,
    * db_utils.py:131-146, so removal is an engine extension, LSM-style):
    * append the keys to the tombstone sidecar (cost ∝ deletes),
    * [[read]] hides them immediately, [[compact]] applies physically.
    */
  def delete(spark: SparkSession, path: String, keys: DataFrame): Unit =
    Versioned.withWriterLease(path) { Tombstones.add(spark, tsAnchor(path), keys) }

  /** Physically apply pending tombstones and bound the small-file count:
    * rewrite the logical view over the physical layout (one file set),
    * then clear the sidecar — publish-then-clear, so a crash in between
    * leaves tombstones that anti-join nothing, never resurrected rows.
    * Flat layout only (a hive-partitioned 100 TB store compacts through
    * a table format's own OPTIMIZE; this is the local-layout verb).
    *
    * READ-QUIESCED WINDOW REQUIRED: the swap is two POSIX renames, not
    * a pointer flip — the store path IS the parquet directory consumers
    * `spark.read.parquet` directly, which is the whole point of this
    * store's layout, and that contract leaves no pointer to publish
    * behind (unlike the index compacts, whose tables live in versioned
    * SUBdirs). A reader listing the path between the renames (or a lazy
    * plan holding the old listing) fails on missing files. Schedule this
    * verb in a maintenance window, or serve reads through a table
    * format whose OPTIMIZE owns the swap — the documented local-layout
    * trade, restated loudly here rather than discovered at 3am.
    */
  def compact(spark: SparkSession, path: String, keyCol: String = "text_hash",
              partitions: Int = 4): Unit =
    Versioned.withWriterLease(path) {
      // flat-layout only, loudly: rewriting a hive-partitioned store
      // through this verb would silently FLATTEN it — downstream readers
      // lose partition pruning with no error anywhere
      val partitioned = Option(new java.io.File(path).listFiles())
        .exists(_.exists(f => f.isDirectory && f.getName.contains("=")))
      require(!partitioned,
        s"chunk store at $path is hive-partitioned; this compact would " +
          "flatten it — at that layout compact through the table format's " +
          "own rewrite (local flat stores only)")
      val clean = read(spark, path, keyCol)
        .select(Schemas.chunkStore.fieldNames.map(org.apache.spark.sql.functions.col): _*)
        .repartition(partitions)
      val tmp = s"$path.compacting-${ProcessHandle.current().pid()}-${System.nanoTime()}"
      clean.write.mode(SaveMode.ErrorIfExists).parquet(tmp)
      val dir = new java.io.File(path)
      val bak = new java.io.File(s"$path.precompact")
      Fs.deleteRecursively(spark, bak.getPath)
      if (!dir.renameTo(bak) || !new java.io.File(tmp).renameTo(dir)) {
        // restore-or-fail loudly: never leave the store path empty
        if (!dir.exists() && bak.exists() && !bak.renameTo(dir))
          throw new IllegalStateException(
            s"chunk store compact at $path failed AND could not restore " +
              s"the original from $bak — manual rename required")
        Fs.deleteRecursively(spark, tmp)
        throw new IllegalStateException(
          s"chunk store compact at $path failed (rename refused); original restored")
      }
      Fs.deleteRecursively(spark, bak.getPath)
      Tombstones.clear(spark, tsAnchor(path))
    }
}
