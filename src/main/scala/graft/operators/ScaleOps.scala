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

  /** Spread a CPU-bound stage across the cluster when its input arrives in
    * fewer partitions than the cluster has cores — the optimization-guide
    * §2.5 "one huge unsplittable file" fix (here: single-row-group fixture
    * parquet makes every scan a 1-task stage, so per-row kernels — embedder,
    * chunker, winnow, signature hashing, blocked cosine — ran on one core of
    * a 32-core machine).
    *
    * Scale-adaptive by construction, not a local[32] constant: the branch
    * compares the plan's actual partition count against
    * `sparkContext.defaultParallelism`, so on a cluster reading a 100 TB
    * table in thousands of splits this is a NO-OP — it only fires for
    * under-split inputs, where redistributing once before heavy per-row work
    * is the standard remedy. Round-robin repartition is deterministic under
    * task retries (sort-before-repartition, SPARK-23207) and row-preserving;
    * call sites are all order-insensitive downstream (they re-aggregate,
    * re-join, or re-sort). Streaming frames pass through untouched (their
    * per-batch parallelism is the source's concern).
    */
  def spread[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    if (ds.isStreaming) ds
    else {
      val target = ds.sparkSession.sparkContext.defaultParallelism
      // Deciding from ds.rdd is only safe on SHUFFLE-FREE plans: under AQE
      // (on in every driver main) Dataset.rdd finalizes the adaptive plan,
      // which MATERIALIZES every upstream shuffle stage — the input chain
      // would run once here at plan-construction time and again under the
      // real action (round-19 fix; measured 2x on the d10/m06 ingest
      // pipeline, whose spread input is the dedup window's exchange).
      // A frame with a shuffle below is already distributed by that
      // exchange (spark.sql.shuffle.partitions / AQE policy), so spread
      // restricts itself to scan-level frames, where building the RDD
      // schedules no job.
      // executedPlan (NOT sparkPlan: EnsureRequirements hasn't inserted
      // distribution exchanges there yet) — under AQE the prepared plan is
      // wrapped in AdaptiveSparkPlanExec, whose initialPlan (inputPlan run
      // through the stage-preparation rules, EnsureRequirements included)
      // carries them; inspecting it plans the query but executes nothing
      val planned = ds.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      val hasShuffle = planned.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
      if (hasShuffle) ds
      else if (ds.rdd.getNumPartitions < target) ds.repartition(target) else ds
    }
  }

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

  // Last raw dir handed to setCheckpointDir. SparkContext stores a QUALIFIED
  // path with a fresh UUID subdirectory appended, so getCheckpointDir never
  // equals the raw conf value — comparing against it would make the skip
  // branch unreachable and re-run mkdirs + a new UUID dir on every reliable
  // checkpoint call (e.g. once per connected-components iteration).
  @volatile private var lastSetCheckpointDir: Option[String] = None

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
        // reliable mode without an explicit dir would silently fall back to
        // driver-local tmp — on a multi-node cluster executors would write
        // checkpoint partitions to their own local disks and cross-executor
        // reads fail, defeating the durability the mode exists for
        val dir = spark.conf.getOption(CheckpointDirConf).getOrElse(
          throw new IllegalArgumentException(
            s"$CheckpointModeConf=reliable requires $CheckpointDirConf " +
              "(a durable shared filesystem path, e.g. hdfs://... or s3://...); " +
              "a driver-local tmp default is not durable on a cluster"))
        if (!lastSetCheckpointDir.contains(dir) || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          lastSetCheckpointDir = Some(dir)
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

  /** Declared-output global sort over an expensive chain: materialize the
    * frame, THEN sort. A global `orderBy` shuffles by RangePartitioning,
    * and building the range bounds runs a sampling pass that RE-EXECUTES
    * the entire upstream chain just to learn the key distribution — for a
    * query whose chain is expensive relative to its output, the declared
    * sort silently doubles the query (measured on x07's candidate+verify
    * chain: +1.1 s of pure recompute at sf0.1). Checkpointing first makes
    * the sampling pass a re-read of the materialized result. Use on final
    * declared sorts whose upstream is nontrivial; the materialization
    * honors `spark.graft.checkpoint.mode` ([[checkpointed]]).
    */
  def sortedOnce(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    checkpointed(df).orderBy(cols: _*)
}
