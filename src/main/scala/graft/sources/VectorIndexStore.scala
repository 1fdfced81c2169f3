package graft.sources

import graft.operators.{IvfIndex, PqIndex}
import org.apache.spark.sql.SparkSession

/** Build-once / probe-many lifecycle for the ANN index family.
  *
  * The reference's vector index is a PERSISTENT artifact: created once,
  * idempotently, on client init, then queried forever (db_utils.py:48,
  * 120-127 — create-if-not-exists DDL + the HNSW index declaration at
  * 93-110). Until round 5 the engine retrained and re-encoded IVF/PQ inside
  * every query invocation — correct, but the wrong lifecycle for 100 TB,
  * where training + encoding is an hours-long build job and probes are
  * sub-second reads. This store is the engine's equivalent of the
  * reference's idempotent DDL:
  *
  *   - `ensureIvf`/`ensurePq` are the "CREATE INDEX IF NOT EXISTS": the
  *     first caller pays the train+assign/encode+write; every later caller
  *     (and every later QUERY, in any JVM) sees a complete published
  *     artifact and goes straight to probing. Publication is atomic
  *     (temp-dir + rename via [[PhysicalLayout.ensureDir]]), so concurrent
  *     builders cannot interleave half-written indexes.
  *   - The artifact path embeds a content fingerprint of the embeddings
  *     fixture ([[PhysicalLayout.sourceTag]]): a regenerated corpus misses
  *     the cache instead of silently serving a stale index.
  *   - The vectors/encoded tables are parquet PARTITIONED BY cell, so a
  *     probe's `cell IN (...)` predicate prunes at the source — `nProbe`
  *     of `nCells` directories read, which is the layout that makes IVF
  *     the distributed answer at 100 TB (SCALE.md "ANN memory story").
  *
  * Local builds root the store under java.io.tmpdir; a cluster deployment
  * points [[root]] at durable shared storage (same boundary-not-storage
  * contract as ChunkStore).
  */
object VectorIndexStore {

  /** Conf key overriding the artifact root (default: system tmpdir). */
  val RootConf = "spark.graft.index.dir"

  private def root(spark: SparkSession): String =
    spark.conf.getOption(RootConf)
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_index")

  private def tag(sfDir: String): String =
    sfDir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      PhysicalLayout.sourceTag(sfDir, "embeddings")

  // nCells is part of the artifact identity: two geometries must not share
  // a published directory
  def ivfPath(spark: SparkSession, sfDir: String, nCells: Int): String =
    s"${root(spark)}/ivf${nCells}_${tag(sfDir)}"

  def pqPath(spark: SparkSession, sfDir: String): String =
    s"${root(spark)}/pq_${tag(sfDir)}"

  /** Idempotent IVF index build over the `embeddings` fixture: train the
    * coarse quantizer, assign every vector its cell, publish model sidecar +
    * cell-partitioned vectors. Returns the artifact path; a complete
    * artifact short-circuits (no training scan).
    */
  def ensureIvf(spark: SparkSession, sfDir: String, nCells: Int = 16): String = {
    val path = ivfPath(spark, sfDir, nCells)
    PhysicalLayout.ensureDir(path) { tmp =>
      val emb = Tables.load(spark, sfDir, "embeddings")
      val model = IvfIndex.train(spark, emb, k = nCells)
      IvfIndex.save(spark, model, IvfIndex.assign(spark, emb, model), tmp)
      markComplete(tmp)
    }
    path
  }

  /** Idempotent IVF-PQ index build: coarse cells + residual codebooks +
    * cell-partitioned one-byte-per-subspace codes (no full-precision
    * vectors in the artifact — that is the 32x memory point).
    */
  def ensurePq(spark: SparkSession, sfDir: String): String = {
    val path = pqPath(spark, sfDir)
    PhysicalLayout.ensureDir(path) { tmp =>
      val emb = Tables.load(spark, sfDir, "embeddings")
      val model = PqIndex.train(spark, emb)
      PqIndex.save(spark, model, PqIndex.encode(spark, emb, model), tmp)
      markComplete(tmp)
    }
    path
  }

  /** INCREMENTAL maintenance for the IVF artifact: assign new vectors with
    * the EXISTING model (no retrain — the standard IVF append path: coarse
    * geometry drifts slowly, so retraining is a scheduled rebuild, not a
    * per-batch cost) and append into the cell-partitioned layout.
    * Idempotent via the vec_id anti-join; probe results over
    * build(A)+append(B) equal probes over assign(A ∪ B) with the same
    * model (ArtifactStoresSpec). Each effective append logs an
    * assignment-distortion watermark to `qerr` (see [[logWatermark]]) —
    * the IVF analogue of the PQ quantization-error series.
    */
  def appendIvf(spark: SparkSession, path: String, newVectors: org.apache.spark.sql.DataFrame): Unit =
    Versioned.withWriterLease(path) {
    val model = IvfIndex.loadModel(spark, path)
    val dir = IvfIndex.vectorsDir(path)
    val existing = spark.read.parquet(dir).select("vec_id").distinct()
    val fresh = newVectors.join(existing, Seq("vec_id"), "left_anti")
    if (fresh.isEmpty) return // redelivered batch: nothing to assign, no watermark row
    IvfIndex.assign(spark, fresh, model)
      .write.mode("append").partitionBy("cell").parquet(dir)
    logWatermark(spark, path, IvfIndex.distortionStats(spark, fresh, model))
  }

  /** Small-file COMPACTION for the IVF vectors table: scheduled appends
    * leave one file set per append inside every cell directory; the
    * rewrite repartitions by cell (≈ one file per cell) and publishes
    * behind a [[Versioned]] pointer — the first compaction UPGRADES the
    * plain `vectors` layout to the pointer protocol (reads fall back to
    * the plain dir until then, so existing artifacts are untouched), and
    * the legacy dir is removed once a later compaction proves the pointer
    * authoritative. Readers mid-probe keep their resolved version.
    */
  def compactIvf(spark: SparkSession, path: String, nCells: Int = 16): Unit =
    Versioned.withWriterLease(path) {
    val hadPointer = graft.sources.Versioned.readPointer(path, "vectors").isDefined
    val all = IvfIndex.loadVectors(spark, path)
    Versioned.publish(path, "vectors", -1L) { v =>
      all.repartition(nCells, org.apache.spark.sql.functions.col("cell"))
        .write.partitionBy("cell").parquet(v)
    }
    // the plain legacy dir has had no new readers since the first pointer
    // publish — remove it once a SECOND compaction confirms that
    if (hadPointer) {
      val legacy = new java.io.File(s"$path/vectors")
      if (legacy.exists()) {
        import scala.reflect.io.Directory
        new Directory(legacy).deleteRecursively()
      }
    }
  }

  /** [[compactIvf]] for the PQ encoded table — same pointer upgrade. */
  def compactPq(spark: SparkSession, path: String, nCells: Int = 16): Unit =
    Versioned.withWriterLease(path) {
    val hadPointer = graft.sources.Versioned.readPointer(path, "encoded").isDefined
    val all = PqIndex.loadEncoded(spark, path)
    Versioned.publish(path, "encoded", -1L) { v =>
      all.repartition(nCells, org.apache.spark.sql.functions.col("cell"))
        .write.partitionBy("cell").parquet(v)
    }
    if (hadPointer) {
      val legacy = new java.io.File(s"$path/encoded")
      if (legacy.exists()) {
        import scala.reflect.io.Directory
        new Directory(legacy).deleteRecursively()
      }
    }
  }

  /** INCREMENTAL maintenance for the IVF-PQ artifact: encode new vectors
    * with the EXISTING coarse cells and codebooks (no retrain — identical
    * rationale to [[appendIvf]]: quantizer geometry drifts slowly, so
    * retraining is a scheduled rebuild, not a per-batch cost) and append
    * the one-byte codes into the cell-partitioned layout. Idempotent via
    * the vec_id anti-join.
    *
    * Each effective append logs a QUANTIZATION-ERROR WATERMARK into
    * `path/qerr` — (append_seq, n_vectors, mean_sq_err of the appended
    * batch under the existing codebooks). A drifting corpus shows a rising
    * error series, which is the operational signal that the scheduled
    * retrain is due (the per-batch analogue of a clustering-quality
    * monitor; asserted in ArtifactStoresSpec).
    */
  def appendPq(spark: SparkSession, path: String, newVectors: org.apache.spark.sql.DataFrame): Unit =
    Versioned.withWriterLease(path) {
    val model = PqIndex.loadModel(spark, path)
    val dir = PqIndex.encodedDir(path)
    val existing = spark.read.parquet(dir).select("vec_id").distinct()
    val fresh = newVectors.join(existing, Seq("vec_id"), "left_anti")
    if (fresh.isEmpty) return // redelivered batch: nothing to encode, no watermark row
    PqIndex.encode(spark, fresh, model)
      .write.mode("append").partitionBy("cell").parquet(dir)
    logWatermark(spark, path, PqIndex.quantizationStats(spark, fresh, model))
  }

  /** Append one (n_vectors, mean_sq_err, append_seq) watermark row to the
    * artifact's `qerr` log — the error series both append paths emit (PQ
    * reconstruction error, IVF assignment distortion); a rising series is
    * the retrain-due signal.
    */
  private def logWatermark(spark: SparkSession, path: String,
                           stats: org.apache.spark.sql.DataFrame): Unit = {
    val seq =
      try spark.read.parquet(s"$path/qerr").count()
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getErrorClass == "PATH_NOT_FOUND" => 0L
      }
    stats.withColumn("append_seq", org.apache.spark.sql.functions.lit(seq))
      .coalesce(1).write.mode("append").parquet(s"$path/qerr")
  }

  // ensureDir's completeness marker is a top-level _SUCCESS; the parquet
  // sub-tables each write their own, but the artifact is only complete once
  // ALL sub-tables are down
  private def markComplete(dir: String): Unit = {
    val ok = new java.io.File(dir, "_SUCCESS").createNewFile()
    require(ok || new java.io.File(dir, "_SUCCESS").exists(),
      s"could not mark index artifact complete at $dir")
  }
}
