package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unbounded-source streaming: the rate source generates rows continuously
  * (no file listing), driving the same windowed-aggregation operators used
  * over `events` — demonstrates the engine's streaming surface is not tied
  * to the file source.
  */
class RateSourceSpec extends SparkTestBase {

  test("windowed aggregation over the unbounded rate source produces rows") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500")
      .load() // (timestamp, value)
    val agg = rate
      .withWatermark("timestamp", "0 seconds")
      .groupBy(window(col("timestamp"), "1 second"), (col("value") % 5).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("bucket"), col("n"))
    val q = agg.writeStream.format("memory").queryName("rate_agg")
      .outputMode("complete").start()
    try {
      // let a few micro-batches run
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var n = 0L
      while (n == 0 && System.nanoTime() < deadline) {
        Thread.sleep(500)
        n = spark.table("rate_agg").count()
      }
      assert(n > 0, "rate-source windowed aggregation emitted no rows in 15s")
      val buckets = spark.table("rate_agg").select("bucket").distinct().count()
      assert(buckets >= 1 && buckets <= 5)
    } finally q.stop()
  }
}
