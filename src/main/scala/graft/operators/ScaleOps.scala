package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management helpers (SURVEY.md §2.B partitioning row;
  * the 100 TB levers): salting for skewed join keys, explicit co-partitioning.
  * AQE's skew-join handling covers most cases at runtime; salting is the
  * static fallback when a single key exceeds what one task can hold.
  */
object ScaleOps {

  /** Salted equi-join for a skewed big side against a non-broadcastable
    * small side: the big side spreads each hot key over `saltBuckets`
    * partitions (salt derived deterministically from `saltSource`, NOT
    * rand() — reproducibility), the small side is replicated `saltBuckets`
    * times. Join runs on (key, salt); result == plain equi-join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, saltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Co-partition two frames on the join key before a sequence of joins /
    * aggregations over the same key — one shuffle, reused by every
    * downstream stage (Catalyst recognizes the existing hash partitioning).
    */
  def coPartition(df: DataFrame, key: String, numPartitions: Int): DataFrame =
    df.repartition(numPartitions, col(key))

  /** `spark.graft.checkpoint.mode`: how [[checkpointed]] materializes a
    * multiply-read frame. `local` (default) — executor-memory/disk
    * localCheckpoint, the right call on a single machine and for bounded
    * demos; `reliable` — durable `checkpoint()` into
    * `spark.graft.checkpoint.dir` (HDFS/S3 on a cluster), surviving
    * executor loss; `none` — no materialization (recompute per read;
    * useful for plan inspection).
    */
  val CheckpointModeConf = "spark.graft.checkpoint.mode"
  val CheckpointDirConf = "spark.graft.checkpoint.dir"

  /** Materialize a frame that downstream stages read more than once
    * (self-join sides, iterative fixpoints, verify passes) and truncate its
    * lineage. This is THE cluster-fidelity seam: every engine call site
    * uses this helper, so moving from local[n] to a 1000-executor cluster
    * with durable checkpoints is one conf
    * (`spark.graft.checkpoint.mode=reliable` +
    * `spark.graft.checkpoint.dir=hdfs://...`), not a rewrite.
    * `localCheckpoint` blocks are lost with their executor — acceptable
    * locally, not for a multi-hour 100 TB job.
    */
  def checkpointed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(CheckpointModeConf, "local") match {
      case "local" => df.localCheckpoint()
      case "none" => df
      case "reliable" =>
        val sc = spark.sparkContext
        spark.conf.getOption(CheckpointDirConf) match {
          // an EXPLICIT dir always wins — set-if-empty would silently pin
          // the job to whatever dir happened to be set first (e.g. a
          // driver-local tmp default), defeating the durability the mode
          // exists for
          case Some(dir) if !sc.getCheckpointDir.contains(dir) =>
            sc.setCheckpointDir(dir)
          case None if sc.getCheckpointDir.isEmpty =>
            sc.setCheckpointDir(
              s"${System.getProperty("java.io.tmpdir")}/graft_checkpoints")
          case _ => // already pointing at the right place
        }
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$CheckpointModeConf must be local|reliable|none, got '$other'")
    }
  }

  /** Chaining syntax for [[checkpointed]]: `df.graftCheckpoint()`. */
  implicit class CheckpointSyntax(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(): DataFrame = ScaleOps.checkpointed(df)
  }
}
