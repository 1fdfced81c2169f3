package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COLD full-precision vector store an encoded (PQ) serving
  * composition pairs with — the same store every exact re-rank already
  * consults. The encoded artifact deliberately carries no full-precision
  * vectors (one byte per subspace instead of 4·dim is its point, ~32×);
  * that makes it the one geometry that cannot rebuild itself at a new
  * shard count from its own tables (decoding codes would bake
  * quantization error into the new artifact). A streaming-fed encoded
  * index therefore persists each batch's embeddings here, and the growth
  * loop re-encodes from this store.
  *
  * PHYSICAL-ONLY by design — no tombstone sidecar: the serving INDEX's
  * logical membership is the single source of deletion truth, and every
  * consumer of this store semi-joins it ([[readMember]]). Duplicating
  * the delete axis here would have to stay transactionally in step with
  * the index's own sidecars across compacts and re-adds (two delete
  * states that can disagree — exactly the class of silent divergence the
  * round-16 catch-up race came from); one truth + a semi-join cannot
  * disagree with itself. The cost is rows for deleted ids lingering
  * until [[vacuum]] — storage, never served.
  *
  * First-arrival upsert ([[upsert]] — vec_id anti-join), so checkpoint
  * redelivery is a no-op. A re-add that changes a document's text keeps
  * the FIRST payload here (documented: payload-replacing upsert needs a
  * delete+vacuum first; the fixture corpora derive embeddings
  * deterministically from doc text, so drill payloads never diverge).
  */
object FpStore {

  /** Append `batch` (vec_id, label, embedding), skipping vec_ids already
    * present — first-arrival, redelivery-safe. Each batch is stamped
    * with a monotone `seq` (max+1): every row of one upsert shares one
    * seq, so each parquet file carries a CONSTANT seq whose min/max
    * footer stats let [[since]] prune all pre-watermark files from the
    * scan — the delta-fetch shape the encoded catch-up replay needs
    * (fetching a batch-sized window delta must not re-read the
    * full-width corpus; the IVF append journal exists for exactly this,
    * and here the store's own append-only layout IS the journal).
    */
  def upsert(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    val deduped = batch.select(col("vec_id"), col("label"), col("embedding"))
      .dropDuplicates("vec_id")
    val fresh =
      if (!Fs.exists(spark, path)) deduped
      else deduped.join(spark.read.parquet(path).select("vec_id"),
        Seq("vec_id"), "left_anti")
    fresh.withColumn("seq", lit(maxSeq(spark, path) + 1))
      .write.mode("append").parquet(path)
  }

  /** The latest upsert seq (−1 on an absent/empty store) — the
    * watermark a snapshot captures so a later [[since]] serves exactly
    * the window's upserts. Column-pruned aggregate.
    */
  def maxSeq(spark: SparkSession, path: String): Long = {
    if (!Fs.exists(spark, path)) return -1L
    val row = spark.read.parquet(path).agg(max(col("seq"))).head()
    if (row.isNullAt(0)) -1L else row.getLong(0)
  }

  /** Rows upserted after `watermark` — file-stats-pruned (each file's
    * constant seq makes `seq > w` skip pre-watermark files without
    * reading their payload bytes).
    */
  def since(spark: SparkSession, path: String, watermark: Long): DataFrame =
    spark.read.parquet(path).filter(col("seq") > watermark)
      .select("vec_id", "label", "embedding")

  /** The raw physical store (payloads for every id ever upserted). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("vec_id", "label", "embedding")

  /** The store scoped to a MEMBERSHIP frame (one `vec_id` column — the
    * serving index's logical view): the rebuild/re-rank corpus. Deleted
    * ids fall out here because they fall out of the membership, not
    * because this store tracks them. De-duplicated by vec_id: [[upsert]]
    * is not leased (the sinks are serial; the lease lives on the INDEX
    * the store pairs with), so two racing writers can land the same id
    * twice — one row per id is this reader's contract either way, and a
    * downstream build/append fed duplicates would double-materialize
    * them (the per-shard idempotence anti-joins check EXISTING presence,
    * not intra-batch dups).
    */
  def readMember(spark: SparkSession, path: String,
                 membership: DataFrame): DataFrame =
    read(spark, path).join(membership.select("vec_id").distinct(),
      Seq("vec_id"), "left_semi")
      .dropDuplicates("vec_id")

  /** Bound the lingering-deleted-rows storage: rewrite the store down to
    * `membership` (the maintenance analogue of the index compacts; same
    * publish shape as [[ChunkStore.compact]] — POSIX rename, local flat
    * stores only, and the same READ-QUIESCED WINDOW contract: the store
    * path is the parquet dir readers list directly, so the two-rename
    * swap must not race a read — schedule it, or let a table format's
    * OPTIMIZE own the swap at cloud scale).
    */
  def vacuum(spark: SparkSession, path: String,
             membership: DataFrame): Unit =
    Versioned.withWriterLease(path) {
      require(!path.contains("://"),
        s"FpStore.vacuum publishes $path by directory rename (POSIX only)")
      // keep the seq column through the rewrite: a post-vacuum upsert
      // still stamps max+1, and a catch-up watermark taken before the
      // vacuum stays comparable
      val clean = spark.read.parquet(path)
        .join(membership.select("vec_id").distinct(), Seq("vec_id"), "left_semi")
        .dropDuplicates("vec_id")
      val tmp = s"$path.vacuuming-${ProcessHandle.current().pid()}-${System.nanoTime()}"
      clean.write.mode("errorifexists").parquet(tmp)
      val dir = new java.io.File(path)
      val bak = new java.io.File(s"$path.prevacuum")
      Fs.deleteRecursively(spark, bak.getPath)
      if (!dir.renameTo(bak) || !new java.io.File(tmp).renameTo(dir)) {
        if (!dir.exists() && bak.exists() && !bak.renameTo(dir))
          throw new IllegalStateException(
            s"FpStore vacuum at $path failed AND could not restore from " +
              s"$bak — manual rename required")
        Fs.deleteRecursively(spark, tmp)
        throw new IllegalStateException(
          s"FpStore vacuum at $path failed (rename refused); original restored")
      }
      Fs.deleteRecursively(spark, bak.getPath)
    }
}
