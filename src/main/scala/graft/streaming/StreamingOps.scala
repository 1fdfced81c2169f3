package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.B streaming row): windowed
  * aggregations with watermarks, streaming dedup, and a foreachBatch upsert
  * sink mirroring the reference's store step (A12+A14), all over the `events`
  * fixture.
  *
  * The transformations are defined on plain DataFrames so the SAME code path
  * serves batch and streaming (Spark's unified model); `runToMemory` executes
  * them against a file-stream source and drains it synchronously — the local
  * stand-in for a real continuous source at cluster scale.
  */
object StreamingOps {

  /** Streaming read of the events fixture (file source). Same ns→µs handling
    * as the batch loader (Tables.loadEvents).
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // File-stream source wants a directory; pathGlobFilter selects just the
    // events table out of the fixture dir.
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling-window aggregate: 6-hour windows per event_type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Sliding-window aggregate: 12-hour windows every 6 hours. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "12 hours", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Session windows (30-minute gap) per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  /** Streaming dedup on (user_id, event_type): first arrival wins (A12
    * streaming form).
    */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select("user_id", "event_type").dropDuplicates("user_id", "event_type")

  /** Execute a streaming transformation to completion against the bounded
    * file source and return the materialized result.
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  mode: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(name)
  }

  /** foreachBatch upsert sink (A14): per micro-batch, merge-on-key into a
    * parquet target — new keys appended, existing keys kept (first-arrival
    * semantics, matching the reference's skip-if-hash-exists insert,
    * db_utils.py:131-146 — generalized to any key column).
    */
  def upsertSink(spark: SparkSession, streamed: DataFrame, keyCol: String,
                 targetPath: String, checkpoint: String): Unit = {
    val q = streamed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val existingKeys =
          try sp.read.parquet(targetPath).select(keyCol).distinct()
          catch { case _: Throwable => null }
        val fresh =
          if (existingKeys == null) batch.dropDuplicates(keyCol)
          else batch.dropDuplicates(keyCol).join(existingKeys, Seq(keyCol), "left_anti")
        fresh.write.mode("append").parquet(targetPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
