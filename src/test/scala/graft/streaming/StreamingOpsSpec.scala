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

  test("binary arrival ingest dedups in-batch and is idempotent across loads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_arrival").toString
    val src = s"$dir/src"
    val target = s"$dir/store"
    // two distinct payloads; b.txt and c.txt are duplicates after
    // whitespace normalization — min doc_key (b_txt) must survive
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.write(java.nio.file.Paths.get(s"$src/a.txt"), "hello world".getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/b.txt"), "dup   text".getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/c.txt"), " dup text ".getBytes)
    StreamingOps.binaryArrivalIngest(spark, src, "*.txt", target, s"$dir/ckpt1")
    val first = spark.read.parquet(target)
    assert(first.count() == 2)
    assert(first.select("doc_key").as[String].collect().sorted.sameElements(
      Array("a_txt", "b_txt")))
    // re-delivery with a fresh checkpoint: store-side anti-join must keep
    // the run a no-op (first-arrival semantics across loads)
    StreamingOps.binaryArrivalIngest(spark, src, "*.txt", target, s"$dir/ckpt2")
    assert(spark.read.parquet(target).count() == 2)
    // a new arrival alongside the old files is picked up
    Files.write(java.nio.file.Paths.get(s"$src/d.txt"), "fresh arrival".getBytes)
    StreamingOps.binaryArrivalIngest(spark, src, "*.txt", target, s"$dir/ckpt3")
    assert(spark.read.parquet(target).count() == 3)
  }
}
