package graft

import org.apache.spark.sql.SparkSession

// scratch diagnostic — deleted before commit
object TmpStageDiag {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val sfDir = "/root/testdata/sf0.01"
    val b = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.index.dir", s"/tmp/graft_stagediag_${args(1)}/index")
    if (master.startsWith("local-cluster")) {
      val absCp = System.getProperty("java.class.path").split(":")
        .filter(_.nonEmpty).map(p => new java.io.File(p).getAbsolutePath).mkString(":")
      b.config("spark.executor.extraClassPath", absCp)
        .config("spark.executor.memory", "2g")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val sh = si.taskMetrics.shuffleWriteMetrics.recordsWritten
        if (sh > 0) stages.add(s"stage=${si.stageId} tasks=${si.numTasks} shuffleRows=$sh name=${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    val path = graft.sources.VectorIndexStore.ensureIvf(spark, sfDir)
    val panel = graft.operators.AnnEval.queryPanel(spark,
      graft.sources.Tables.load(spark, sfDir, "embeddings"))
    val r = graft.operators.AnnEval.ivfTopK(spark, path, panel, k = 10, nProbe = 4).collect().length
    org.apache.spark.sql.GraftShim.drainListenerBus(spark)
    println(s"DIAG rows=$r mode=$master")
    stages.forEach(s => println(s"DIAG $s"))
    spark.stop()
  }
}
