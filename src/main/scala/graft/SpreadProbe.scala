package graft

import org.apache.spark.sql.SparkSession

/** Scratch round-19 probe: does building the d10 plan (Ingest.pipeline →
  * spread) schedule jobs at plan-construction time? Counts jobs during
  * fn() vs during the action.
  */
object SpreadProbe {
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
    graft.expressions.GraftFunctions.register(spark)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val rowsIn = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        println(s"[spreadprobe] job ${j.jobId}: " +
          Option(j.properties).map(_.getProperty("spark.job.description",
            Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
            .getOrElse("?") + " stages=" + j.stageInfos.map(_.name).mkString(" | "))
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) rowsIn.addAndGet(m.inputMetrics.recordsRead)
      }
    })
    (1 to 2).foreach { rep =>
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      val j0 = jobs.get(); val r0 = rowsIn.get()
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      val frame = graft.operators.Ingest.pipeline(spark, docs)
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      val jPlan = jobs.get() - j0; val rPlan = rowsIn.get() - r0
      frame.write.mode("overwrite").format("noop").save()
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      println(s"[spreadprobe] rep $rep plan-time jobs=$jPlan rows=$rPlan | total jobs=${jobs.get() - j0} rows=${rowsIn.get() - r0}")
    }
    spark.stop()
  }
}
