package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A SEQ-ORDERED change-data-capture log — the arrival format that makes
  * delete/re-add histories replayable, which filename markers cannot be
  * (round-16's documented boundary: a `del_x` marker and a later
  * `readd_doc_x` marker collapse into ONE unordered batch on a
  * fresh-checkpoint replay, and the true order — and therefore the final
  * state — is unrecoverable; the compact that separated them in wall
  * time left no trace in the feed).
  *
  * Format: an append-only parquet directory of
  * `(seq: long, op: 'add'|'del', doc_id: long, text: string)` rows —
  * seq is TOTAL and monotone across the whole log (the producer's
  * write-ahead discipline; every real CDC source — a database WAL, a
  * Kafka partition offset, a table-format commit sequence — provides
  * exactly this). Consumers ([[graft.streaming.StreamingOps.cdcLogShardedIngest]])
  * stream the directory and collapse each micro-batch to its per-id NET
  * op (max-seq row wins), which makes the incremental run and a
  * fresh-checkpoint full replay (the entire history as one batch)
  * converge to the same final state for EVERY add/del interleaving —
  * including the pairs that straddle external compacts.
  *
  * [[append]] is the producer fixture (drill corpora, tests): it stamps
  * the next contiguous seqs itself. A production producer brings its own
  * seq axis; the only contract is monotone-in-arrival-order.
  */
object CdcLog {

  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** Next seq to stamp: max(seq)+1, or 0 on an empty/absent log. */
  def nextSeq(spark: SparkSession, dir: String): Long = {
    if (!Fs.exists(spark, dir)) return 0L
    val row = spark.read.schema(schema).parquet(dir).agg(max(col("seq"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0) + 1
  }

  /** Producer fixture: append `ops` (op, doc_id, text) in order, stamping
    * contiguous seqs from [[nextSeq]]. One file per call (arrival batches
    * are feed-sized); `text` may be null for 'del' rows.
    */
  def append(spark: SparkSession, dir: String,
             ops: Seq[(String, Long, String)]): Unit = {
    require(ops.forall(o => o._1 == "add" || o._1 == "del"),
      s"CdcLog ops must be add|del: ${ops.map(_._1).distinct}")
    val from = nextSeq(spark, dir)
    val rows = ops.zipWithIndex.map { case ((op, id, text), i) =>
      org.apache.spark.sql.Row(from + i, op, id, text)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("append").parquet(dir)
  }

  /** The streaming read over the log directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Collapse a batch of log rows to the per-id NET op: the max-seq row
    * per doc_id. Order within the batch is the log's order, so a replay
    * that collapses history into one batch lands on the same net state
    * the incremental run reached step by step.
    */
  def collapse(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    batch.withColumn("__rn", row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(desc("seq"))))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
