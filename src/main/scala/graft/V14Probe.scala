package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch optimization-round probe (round 19): phase timing + sub-plan
  * dumps for v14's imperative pipeline (train / encode / shortlist /
  * re-rank / hits). Not part of the driver contract.
  */
object V14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v14probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // count jobs/stages/tasks via listener
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })

    (1 to 3).foreach { rep =>
      val j0 = jobs.get(); val s0 = stages.get(); val t0 = tasks.get()
      val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      val model = time("train")(graft.operators.PqIndex.train(spark, emb))
      val encoded = graft.operators.PqIndex.encode(spark, emb, model)
      val query = time("query head")(
        emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head())
      val pq = time("search+checkpoint")(graft.operators.ScaleOps.checkpointed(
        graft.operators.PqIndex.search(spark,
          encoded.filter(col("vec_id") =!= 0), emb, model, query,
          k = 10, shortlist = 50)))
      val qCol = lit(query.toArray).cast("array<float>")
      val exact = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"), qCol), 6).as("sim"))
        .orderBy(desc("sim"), col("vec_id"))
        .limit(10)
      val hits = time("hits count")(
        pq.select("vec_id").join(exact.select("vec_id"), "vec_id").count())
      time("final agg noop")(
        pq.agg(count(lit(1)).cast("int").as("n_results"),
          (lit(hits) >= 3).cast("int").as("recall_ok"))
          .write.mode("overwrite").format("noop").save())
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      println(s"[v14probe] rep $rep jobs=${jobs.get() - j0} stages=${stages.get() - s0} tasks=${tasks.get() - t0}")
      if (rep == 1) {
        // sub-plan dumps (hand-captured, the PlanDump note)
        val search = graft.operators.PqIndex.search(spark,
          encoded.filter(col("vec_id") =!= 0), emb, model, query, k = 10, shortlist = 50)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("plans/r19/v14_search_subplan_before.txt"),
          search.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        val hj = pq.select("vec_id").join(exact.select("vec_id"), "vec_id")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("plans/r19/v14_hits_subplan_before.txt"),
          hj.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    }
    spark.stop()
  }
}
