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
}
