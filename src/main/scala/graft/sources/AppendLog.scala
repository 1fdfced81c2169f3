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
  * unrecoverable direction.
  */
object AppendLog {

  private def dir(path: String) = s"$path/appendlog"
  private def fromFile(path: String) = s"$path/appendlog.FROM"

  /** The seq after which the log is complete, when a log exists. */
  def completeFrom(path: String): Option[Long] =
    Versioned.metaBackend.readString(fromFile(path))
      .flatMap(_.trim.toLongOption)

  /** Record one effective append batch under the caller's writer lease.
    * `seq` is the qerr append_seq the batch will log.
    */
  def record(spark: SparkSession, path: String, batch: DataFrame,
             seq: Long): Unit = {
    if (completeFrom(path).isEmpty)
      Versioned.metaBackend.writeAtomic(fromFile(path), (seq - 1).toString)
    batch.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("seq", lit(seq))
      .coalesce(1).write.mode("append").parquet(dir(path))
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

  /** Drop the log (compact/retrain rewrote the corpus — the size bound). */
  def clear(spark: SparkSession, path: String): Unit = {
    Fs.deleteRecursively(spark, dir(path))
    Versioned.metaBackend.deleteRecursively(fromFile(path))
  }
}
