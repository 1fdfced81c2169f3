package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch round-19 probe: job/stage census of one
  * OrderStats.exactPercentilesByGroup call over lineitem.
  */
object OsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rowsIn = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val recs = s.stageInfo.taskMetrics.inputMetrics.recordsRead
        rowsIn.addAndGet(recs)
        if (recs > 0)
          println(s"[osprobe] stage ${s.stageInfo.stageId} '${s.stageInfo.name.take(60)}' rows_in=$recs")
      }
    })
    // plan dump of the DISTRIBUTED mode (the W5 plans/r19 evidence): the
    // conf-selected funnel-free shape — no Window partitioned by the group
    // alone anywhere in the plan
    spark.conf.set(graft.operators.OrderStats.PercentileModeConf, "distributed")
    locally {
      val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      val ep = graft.operators.OrderStats.exactPercentilesByGroup(
        li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9, 0.99), "ps")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("plans/r19/r38_percentiles_distributed_mode.txt"),
        ep.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.conf.set(graft.operators.OrderStats.PercentileModeConf, "window")
    (1 to 2).foreach { rep =>
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      val r0 = rowsIn.get()
      val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      val t0 = System.nanoTime()
      val ep = graft.operators.OrderStats.exactPercentilesByGroup(
        li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9, 0.99), "ps")
      ep.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      println(f"[osprobe] rep $rep secs=$secs%.2f rows_in=${rowsIn.get() - r0}")
    }
    spark.stop()
  }
}
