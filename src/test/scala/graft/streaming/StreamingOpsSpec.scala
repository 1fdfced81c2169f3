package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files

class StreamingOpsSpec extends SparkTestBase {

  test("streaming dedup equals batch distinct on bounded input") {
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.dedupKeys(StreamingOps.readEventsStream(spark, sf)),
      "spec_dedup", "append")
    val batch = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id", "event_type").distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty)
  }

  test("tumbling window agg equals batch group-by on bucketed time") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingAgg(StreamingOps.readEventsStream(spark, sf)),
      "spec_tumbling", "complete")
    val batch = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("foreachBatch upsert sink keeps first arrival per key") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert").toString
    val target = s"$dir/target"
    val ckpt1 = s"$dir/ckpt1"
    val ckpt2 = s"$dir/ckpt2"
    // first load writes both keys
    StreamingOps.upsertSink(spark,
      StreamingOps.dedupKeys(StreamingOps.readEventsStream(spark, sf)),
      "user_id", target, ckpt1)
    val n1 = spark.read.parquet(target).count()
    // second identical load must be a no-op (all keys exist)
    StreamingOps.upsertSink(spark,
      StreamingOps.dedupKeys(StreamingOps.readEventsStream(spark, sf)),
      "user_id", target, ckpt2)
    val n2 = spark.read.parquet(target).count()
    assert(n1 > 0 && n1 == n2)
    // exactly one row per user_id
    val dups = spark.read.parquet(target).groupBy("user_id").count()
      .filter($"count" > 1).count()
    assert(dups == 0)
  }
}
