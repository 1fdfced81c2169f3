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
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
             keyCol: String = "text_hash"): Unit = {
    ensure(spark, path)
    val existing = spark.read.parquet(path).select(keyCol).distinct()
    batch.dropDuplicates(keyCol)
      .join(existing, Seq(keyCol), "left_anti")
      .select(Schemas.chunkStore.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Append).parquet(path)
  }
}
