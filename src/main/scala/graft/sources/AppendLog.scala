package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-artifact APPEND LOG — the delta source that makes the catch-up
  * reshard's blocked window delta-shaped instead of corpus-shaped.
  *
  * Without it, `reshardCatchUpReplay` finds the appends that landed
  * during the unleased rebuild by anti-joining the OLD corpus against
  * the snapshot's ids — correct, but the anti-join reads the old
  * corpus full-width (measured 8.25M rows_in / 128 s at the 100× drill
  * point), which at 10⁹ × 1536-d rows means re-reading terabytes to
  * replay a batch. The log removes that scan: [[record]] double-writes
  * each EFFECTIVE append batch (post-idempotence-anti-join rows, tagged
  * with the batch's qerr `append_seq`) into `path/appendlog`, and the
  * replay reads only `seq > watermark` — I/O ∝ the delta.
  *
  * Completeness is explicit, never assumed: `appendlog.FROM` records
  * the seq after which the log is COMPLETE (stamped when the log is
  * first created, i.e. FROM = the pre-existing max seq). [[since]]
  * serves a delta only when `FROM <= watermark` — otherwise the caller
  * falls back to the anti-join (legacy artifacts with no log; logs
  * cleared by a compact/retrain mid-window). [[clear]] runs at
  * compact/retrain: the physical rewrite bounds the log's size by the
  * append volume between compactions (the double-write's cost), and the
  * next append re-creates it with a fresh FROM.
  *
  * Crash ordering: [[record]] runs BEFORE the vectors write inside the
  * append (same writer lease). A crash in between leaves a log row
  * whose vectors never landed — the replay then appends a SURPLUS row
  * to the new root, which the retried original append converges with
  * (idempotence anti-joins on both roots); the reverse order would
  * leave a MISSING log row, which is a silently dropped append — the
  * unrecoverable direction. A crash AFTER record but before the qerr
  * watermark row leaves the retried append re-recording the same batch
  * at the same seq — the replay dedups its delta by vec_id, so the
  * surplus log rows cannot double-materialize.
  *
  * DELETES journal too ([[recordDelete]] / [[deletesSince]], their own
  * `appendlog_del` sidecar and seq axis): a delete that lands during the
  * catch-up window only REMOVES an id from the logical view, and the
  * tombstone sidecar alone cannot witness it across a mid-window compact
  * (the physical apply CLEARS the sidecar — the id would silently
  * resurrect in the new generation). The journal keeps the removal
  * replayable at cost ∝ deletes; completeness is judged by the journal's
  * own FROM stamp AND [[Tombstones.generation]] (an apply clears this
  * journal, so an unchanged generation is the caller's proof that an
  * absent journal means "no window deletes" rather than "cleared").
  */
object AppendLog {

  private def dir(path: String) = s"$path/appendlog"
  private def fromFile(path: String) = s"$path/appendlog.FROM"
  private def delDir(path: String) = s"$path/appendlog_del"
  private def delFromFile(path: String) = s"$path/appendlog_del.FROM"


  /** The seq after which the log is complete, when a log exists. */
  def completeFrom(path: String): Option[Long] =
    Versioned.metaBackend.readString(fromFile(path))
      .flatMap(_.trim.toLongOption)

  /** Record one effective append batch under the caller's writer lease.
    * `seq` is the qerr append_seq the batch will log. Written at the
    * batch's own partitioning — the journal double-write sits on the
    * ingest critical path, and a `coalesce(1)` here would funnel a
    * production tranche's full embedding payload (10⁷ rows × 6 KB)
    * through ONE task and one multi-GB file; the small-file cost of a
    * few files per batch is bounded by the compact-time [[clear]].
    */
  def record(spark: SparkSession, path: String, batch: DataFrame,
             seq: Long): Unit = {
    if (completeFrom(path).isEmpty)
      Versioned.metaBackend.writeAtomic(fromFile(path), (seq - 1).toString)
    batch.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("seq", lit(seq))
      .write.mode("append").parquet(dir(path))
  }

  /** The appended rows with `seq > watermark`, IFF the log is complete
    * back to that watermark — `None` means the caller must fall back to
    * the anti-join (no log, incomplete log, or a FROM stamped without
    * rows — the record() crash window).
    */
  def since(spark: SparkSession, path: String,
            watermark: Long): Option[DataFrame] =
    completeFrom(path)
      .filter(_ <= watermark)
      .filter(_ => Fs.exists(spark, dir(path)))
      .map(_ => spark.read.parquet(dir(path))
        .filter(col("seq") > watermark)
        .select("vec_id", "label", "embedding"))

  /** The seq after which the DELETE journal is complete, when one exists. */
  def delCompleteFrom(path: String): Option[Long] =
    Versioned.metaBackend.readString(delFromFile(path))
      .flatMap(_.trim.toLongOption)

  /** Current delete-journal watermark: the seq of the LAST recorded
    * delete batch (−1 when no journal exists — the same convention the
    * append axis uses for an absent qerr). A snapshot captures this
    * alongside [[Tombstones.generation]]; [[deletesSince]] that watermark
    * is then exactly the window's deletes.
    */
  def delSeqWatermark(spark: SparkSession, path: String): Long = {
    if (!Fs.exists(spark, delDir(path))) return -1L
    val row = spark.read.parquet(delDir(path)).agg(max(col("seq"))).head()
    if (row.isNullAt(0)) -1L else row.getLong(0) // crash-left empty dir
  }

  /** Journal one delete batch (`ids`: one vec_id column) under the
    * caller's writer lease. Journal-FIRST relative to the tombstone
    * sidecar write, for the same crash reason as [[record]]: a crash in
    * between leaves a journal row whose tombstone never landed — the
    * replay then forwards a SURPLUS tombstone (hides an id the retried
    * delete was about to hide anyway); the reverse order could silently
    * lose a removal, the unrecoverable direction.
    */
  def recordDelete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val seq = delSeqWatermark(spark, path) + 1
    if (delCompleteFrom(path).isEmpty)
      Versioned.metaBackend.writeAtomic(delFromFile(path), (seq - 1).toString)
    ids.toDF("vec_id").distinct().withColumn("seq", lit(seq))
      .coalesce(1) // delete batches are takedown-sized by contract
      .write.mode("append").parquet(delDir(path))
  }

  /** The deleted ids with `seq > watermark`, IFF the delete journal is
    * complete back to that watermark. `None` means the caller must
    * reconcile another way (the catch-up replay's reverse delta); note
    * an ABSENT journal with an unchanged [[Tombstones.generation]] means
    * "no deletes ever", which the CALLER distinguishes — this returns
    * None for both.
    */
  def deletesSince(spark: SparkSession, path: String,
                   watermark: Long): Option[DataFrame] =
    delCompleteFrom(path)
      .filter(_ <= watermark)
      .filter(_ => Fs.exists(spark, delDir(path)))
      .map(_ => spark.read.parquet(delDir(path))
        .filter(col("seq") > watermark)
        .select("vec_id"))

  /** Drop both journals (compact/retrain rewrote the corpus — the size
    * bound; the same rewrite applies pending tombstones physically, so
    * the delete journal's rows are equally absorbed into the new
    * baseline).
    */
  def clear(spark: SparkSession, path: String): Unit = {
    Fs.deleteRecursively(spark, dir(path))
    Versioned.metaBackend.deleteRecursively(fromFile(path))
    Fs.deleteRecursively(spark, delDir(path))
    Versioned.metaBackend.deleteRecursively(delFromFile(path))
  }
}
