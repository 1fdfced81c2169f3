package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The generic machinery both sharded compositions share
  * ([[ShardedIvf]] — full-precision shards; [[ShardedPq]] — encoded
  * shards): the disjoint-total hash routing, the `shards.META` sidecar
  * and its loud wrong-S guard, the one-tagging-pass concurrent
  * per-shard BUILD (virgin paths build directly into `shard=r` — no
  * rename, every storage class; rebuilds of a published path go through
  * a scratch sibling + POSIX rename cutover so a mid-build failure
  * leaves the old artifact serving), and the hash-routed APPEND. The
  * per-index build/append bodies are injected, so each composition
  * keeps its own artifact anatomy (IVF: model + vectors + qerr; PQ:
  * coarse + codebooks + encoded + qerr) while the sharding semantics —
  * membership, cutover, sidecars — are one implementation with one
  * spec surface.
  */
private[graft] object Sharding {

  /** Disjoint-total shard id of a vector id. */
  private[graft] def shardCol(shards: Int): Column =
    pmod(xxhash64(col("vec_id")), lit(shards.toLong)).cast("int")

  /** `shards.META` sidecar: the S an artifact was built (or resharded)
    * with. Every verb takes `shards` explicitly (the caller's config),
    * and before this sidecar a mismatched pairing was SILENT wrongness
    * in both directions: probing a 4-shard artifact with shards=3 drops
    * shard 3's candidates from every answer; appending with shards=5
    * routes vectors to a `shard=4` directory no reader ever scans.
    * [[verifyShards]] turns both into a loud error at every entry
    * point. Absent on pre-round-15 artifacts — verbs then trust the
    * caller, as before.
    */
  private def shardsMetaFile(path: String) = s"$path/shards.META"

  private[graft] def writeShardsMeta(path: String, shards: Int): Unit =
    graft.sources.Versioned.metaBackend.writeAtomic(shardsMetaFile(path), shards.toString)

  private[graft] def dropShardsMeta(path: String): Unit =
    graft.sources.Versioned.metaBackend.deleteRecursively(shardsMetaFile(path))

  /** The shard count recorded at build/reshard time, when the artifact
    * carries the sidecar.
    */
  def shardCount(path: String): Option[Int] =
    graft.sources.Versioned.metaBackend.readString(shardsMetaFile(path))
      .flatMap(_.trim.toIntOption)

  /** Loud mismatch guard for every verb that pairs a root with a
    * caller-supplied S. No-op on sidecar-less (legacy) artifacts.
    */
  private[graft] def verifyShards(path: String, shards: Int): Unit =
    shardCount(path).foreach { s =>
      require(s == shards,
        s"sharded artifact at $path was built with S=$s but the caller " +
          s"passed shards=$shards — a wrong S silently drops shards from " +
          "probes or routes appends to unread directories")
    }

  /** The ONE resolution of the concurrent-build pool size both sharded
    * compositions share: the session override
    * ([[ShardedIvf.BuildParallelismConf]]) or the measured default
    * ([[ShardedIvf.BuildParallelism]]).
    */
  private[graft] def buildParallelism(spark: SparkSession): Int =
    spark.conf.getOption(ShardedIvf.BuildParallelismConf)
      .flatMap(_.toIntOption).filter(_ >= 1)
      .getOrElse(ShardedIvf.BuildParallelism)

  /** One tagging pass over `vectors` + S concurrent pruned per-shard
    * builds via `buildAt(dir, partition, rowCount)`. See the object doc
    * for the virgin-vs-rebuild cutover semantics; [[buildParallelism]]
    * bounds the concurrent Spark-job-submitting threads.
    */
  private[graft] def buildSharded(spark: SparkSession, vectors: DataFrame,
                                  path: String, shards: Int,
                                  buildAt: (String, DataFrame, Long) => Unit): Unit = {
    require(shards >= 1, s"shards=$shards")
    // REBUILD of a path with published shards goes through a scratch
    // sibling + directory-rename cutover so a mid-build failure leaves
    // the old artifact fully serving. Directory rename is a POSIX
    // primitive (the object-store meta plane deliberately has none), so
    // an in-place rebuild on remote storage is refused loudly — remote
    // deployments publish at a NEW root, which needs no rename at all.
    // A VIRGIN path builds directly into `shard=r`. Decided BEFORE the
    // corpus-sized tagging write: a refusal must cost S existence
    // checks, not a corpus round trip.
    val rebuild = (0 until shards).exists(r =>
      graft.sources.Versioned.metaBackend.exists(s"$path/shard=$r"))
    if (rebuild) require(!path.contains("://"),
      s"in-place rebuild of $path needs a POSIX directory rename for its " +
        "crash-safe cutover; on remote storage build at a NEW root " +
        "(reshard / ensure*) or delete the artifact first")
    val taggedDir = s"$path/tagged"
    // overwrite: a failed prior build's scratch must not fail the retry
    vectors.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("shard", shardCol(shards))
      .repartition(col("shard")) // shard-clustered: one file per shard dir
      .write.mode("overwrite").partitionBy("shard").parquet(taggedDir)
    try {
      val tagged = spark.read.parquet(taggedDir)
      // one column-pruned pass gives every shard's cardinality
      val counts: Map[Int, Long] = tagged.groupBy("shard").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(shards, buildParallelism(spark)),
        (r: Runnable) => { val t = new Thread(r, "graft-shard-build"); t.setDaemon(true); t })
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      var succeeded = false
      try {
        // Crash atomicity of the rebuild CUTOVER is per-shard (a crash
        // between renames leaves mixed generations — each a valid
        // artifact, but membership may straddle corpora; the sidecar
        // invalidation below keeps verifyShards from blessing that
        // state); callers needing all-or-nothing publication use the
        // store's ensure* entries, whose tmp-dir protocol wraps this.
        val builds = (0 until shards).map { r =>
          Future {
            val target =
              if (rebuild) s"$path/shard=$r.building" else s"$path/shard=$r"
            // a failed prior attempt's leftovers must not fail the retry
            // (the per-index parquet writes are ErrorIfExists)
            graft.sources.Versioned.metaBackend.deleteRecursively(target)
            val part = tagged.filter(col("shard") === r).drop("shard")
            buildAt(target, part, counts.getOrElse(r, 0L))
          }
        }
        Await.result(Future.sequence(builds), Duration.Inf)
        if (rebuild) {
          // the sidecar must not bless a mixed-generation layout if this
          // cutover crashes midway: drop it FIRST (absent sidecar = the
          // legacy trust-the-caller mode), restamp only after the new
          // generation is fully in place
          dropShardsMeta(path)
          for (r <- 0 until shards) {
            graft.sources.Versioned.metaBackend.deleteRecursively(s"$path/shard=$r")
            val ok = new java.io.File(s"$path/shard=$r.building")
              .renameTo(new java.io.File(s"$path/shard=$r"))
            if (!ok) throw new IllegalStateException(
              s"could not publish shard $r of $path (rename failed)")
          }
        }
        // a rebuild at a smaller S must not leave a larger prior build's
        // tail shards lying around as unread directories
        graft.sources.Versioned.metaBackend.list(path)
          .filter(e => e.isDir && e.name.matches("shard=\\d+"))
          .map(_.name.stripPrefix("shard=").toInt).filter(_ >= shards)
          .foreach(r => graft.sources.Versioned.metaBackend
            .deleteRecursively(s"$path/shard=$r"))
        writeShardsMeta(path, shards)
        succeeded = true
      } finally {
        // on failure, Await rethrows the FIRST error while sibling shard
        // builds may still be reading the scratch — quiesce them before
        // the outer finally deletes it (bounded: a wedged sibling must
        // not hang cleanup forever)
        pool.shutdown()
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
        // a failed build must neither leak corpus-sized copies nor block
        // the retry: a failed REBUILD leaves scratch siblings (the
        // published shards are untouched), and a failed VIRGIN build
        // leaves partial shard=r dirs — on a remote path those would
        // read as "published shards" next time and brick the retry on
        // the rename refusal. Both cleaned here; no-ops on success.
        if (rebuild)
          (0 until shards).foreach(r => graft.sources.Versioned.metaBackend
            .deleteRecursively(s"$path/shard=$r.building"))
        else if (!succeeded)
          (0 until shards).foreach(r => graft.sources.Versioned.metaBackend
            .deleteRecursively(s"$path/shard=$r"))
      }
    } finally
      // scratch: on success every shard's vectors live inside its own
      // artifact; on a shard-build failure a corpus-sized copy must not
      // leak (and must not mask the root cause on retry)
      graft.sources.Versioned.metaBackend.deleteRecursively(taggedDir)
  }

  /** Hash-route `batch` to its shards and apply the per-index append
    * under the sharded ROOT's writer lease (serializes concurrent
    * sharded appenders so two batches cannot interleave their per-shard
    * passes). S filtered passes over the BATCH (not the corpus) —
    * append batches are ingest-sized by contract.
    */
  private[graft] def appendRouted(spark: SparkSession, path: String, shards: Int,
                                  batch: DataFrame,
                                  appendAt: (String, DataFrame) => Unit): Unit =
    graft.sources.Versioned.withWriterLease(path) {
      verifyShards(path, shards)
      val tagged = batch
        .select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("shard", shardCol(shards))
      for (r <- 0 until shards) {
        val slice = tagged.filter(col("shard") === r).drop("shard")
        if (!slice.isEmpty) appendAt(s"$path/shard=$r", slice)
      }
    }

  /** Hash-route delete `ids` (one column: vec_id) to their OWNING shards
    * and tombstone each slice through the per-index delete — the same
    * disjoint-total routing as [[appendRouted]], so only shards that own
    * a deleted id pay a sidecar write (cost ∝ deletes, not S). Under the
    * sharded root's writer lease: serializes with appends, retrains and
    * the leased reshard, so a delete cannot land between a reshard's
    * corpus read and its cutover and be lost.
    */
  private[graft] def deleteRouted(spark: SparkSession, path: String, shards: Int,
                                  ids: DataFrame,
                                  deleteAt: (String, DataFrame) => Unit): Unit =
    graft.sources.Versioned.withWriterLease(path) {
      verifyShards(path, shards)
      val tagged = ids.toDF("vec_id").distinct()
        .withColumn("shard", shardCol(shards))
      for (r <- 0 until shards) {
        val slice = tagged.filter(col("shard") === r).drop("shard")
        if (!slice.isEmpty) deleteAt(s"$path/shard=$r", slice)
      }
    }
}
