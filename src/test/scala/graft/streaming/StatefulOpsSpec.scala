package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StatefulOpsSpec extends SparkTestBase {

  test("flatMapGroupsWithState dedup emits each key exactly once across batches") {
    val streamed = StatefulOps.statefulDedup(spark,
      StreamingOps.readEventsStream(spark, sf), Seq("user_id", "event_type"))
    val out = StreamingOps.runToMemory(spark, streamed.toDF(), "stateful_dedup", "append")
    val batch = graft.sources.Tables.load(spark, sf, "events")
      .select(concat_ws("|", col("user_id"), col("event_type")).as("k")).distinct()
    assert(out.count() == batch.count())
    assert(out.exceptAll(batch.toDF("value")).isEmpty ||
           out.toDF("k").exceptAll(batch).isEmpty)
  }

  test("running user stats converge to batch aggregates") {
    import spark.implicits._
    val streamed = StatefulOps.runningUserStats(spark, StreamingOps.readEventsStream(spark, sf))
    val out = StreamingOps.runToMemory(spark, streamed.toDF(), "stateful_stats", "append")
    // last emission per user = cumulative total; on a single micro-batch the
    // one emission equals the batch aggregate
    val lastPerUser = out.groupBy("userId").agg(max("nEvents").as("n"), max("total").as("t"))
    val batch = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id").as("userId"))
      .agg(count(lit(1)).as("n"), sum("value").as("t"))
    val joined = lastPerUser.join(batch, "userId")
      .filter(lastPerUser("n") =!= batch("n") ||
        abs(lastPerUser("t") - batch("t")) > 1e-6)
    assert(joined.count() == 0)
  }
}
