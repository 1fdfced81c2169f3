package graft.operators

import graft.SparkTestBase
import graft.operators.ScaleOps.CheckpointSyntax

/** The cluster-fidelity seam: every multiply-read frame goes through
  * ScaleOps.checkpointed, so checkpoint durability is one conf —
  * localCheckpoint on a laptop, a durable checkpoint dir on a cluster.
  */
class ScaleOpsCheckpointSpec extends SparkTestBase {

  import spark.implicits._

  private def frame() = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  test("default mode is local: lineage truncated, rows preserved") {
    val out = frame().graftCheckpoint()
    assert(out.collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("mode=none returns the frame unmaterialized") {
    spark.conf.set(ScaleOps.CheckpointModeConf, "none")
    try {
      val df = frame()
      assert(ScaleOps.checkpointed(df) eq df)
    } finally spark.conf.unset(ScaleOps.CheckpointModeConf)
  }

  test("mode=reliable writes a durable checkpoint into the configured dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toString
    spark.conf.set(ScaleOps.CheckpointModeConf, "reliable")
    spark.conf.set(ScaleOps.CheckpointDirConf, dir)
    try {
      val out = frame().graftCheckpoint()
      assert(out.count() == 2)
      // the checkpoint must actually live under the configured dir
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        kids ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).exists(_.isFile), s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(ScaleOps.CheckpointModeConf)
      spark.conf.unset(ScaleOps.CheckpointDirConf)
      // clear the sticky SparkContext checkpoint dir — the session is
      // shared across suites, and a stale dir would divert any later
      // reliable-mode checkpoint
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("mode=reliable without a configured dir fails loudly") {
    spark.conf.set(ScaleOps.CheckpointModeConf, "reliable")
    try {
      val e = intercept[IllegalArgumentException](frame().graftCheckpoint())
      assert(e.getMessage.contains(ScaleOps.CheckpointDirConf))
    } finally spark.conf.unset(ScaleOps.CheckpointModeConf)
  }

  test("unknown mode fails loudly") {
    spark.conf.set(ScaleOps.CheckpointModeConf, "bogus")
    try intercept[IllegalArgumentException](frame().graftCheckpoint())
    finally spark.conf.unset(ScaleOps.CheckpointModeConf)
  }
}
