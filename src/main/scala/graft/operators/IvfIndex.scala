package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor (§2.C similarity-search
  * scale path, alternative to random-hyperplane LSH): a small k-means coarse
  * quantizer partitions the corpus into cells; a query probes only the
  * `nProbe` nearest cells, turning a full scan into a pruned partition scan.
  *
  * Deterministic: centroid init = lowest-id vectors, fixed Lloyd iteration
  * count, no RNG. The quantizer trains on a bounded driver-side sample
  * (independent of corpus size); assignment is a narrow map over the corpus.
  * At 100 TB the cell id becomes the table's partition column so probes are
  * partition-pruned at the source.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) extends Serializable {
    def nearestCell(v: Seq[Float]): Int = nearestCells(v, 1).head

    def nearestCells(v: Seq[Float], n: Int): Seq[Int] = {
      val dists = centroids.indices.map { c =>
        var d = 0.0
        val cent = centroids(c)
        var i = 0
        val lim = math.min(cent.length, v.length)
        while (i < lim) { val t = cent(i) - v(i); d += t * t; i += 1 }
        (c, d)
      }
      dists.sortBy { case (c, d) => (d, c) }.take(n).map(_._1)
    }

    /** Squared L2 distance of `v` to its NEAREST centroid — the coarse
      * assignment distortion (the k-means objective per row). A corpus
      * drifting away from the trained cells shows a rising mean, which is
      * the signal that the scheduled retrain is due (appendIvf logs it).
      */
    def assignmentDistortion(v: Seq[Float]): Double = {
      var best = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        var d = 0.0
        val cent = centroids(c)
        var i = 0
        val lim = math.min(cent.length, v.length)
        while (i < lim) { val t = cent(i) - v(i); d += t * t; i += 1 }
        if (d < best) best = d
        c += 1
      }
      best
    }
  }

  /** One-row coarse-distortion summary of assigning `vectors` with
    * `model`: (n_vectors, mean_sq_err) — the IVF analogue of
    * [[PqIndex.quantizationStats]].
    */
  def distortionStats(spark: SparkSession, vectors: org.apache.spark.sql.DataFrame,
                      model: Model): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bc = spark.sparkContext.broadcast(model)
    vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (_, e) => bc.value.assignmentDistortion(e) }
      .toDF("sq_err")
      .agg(count(lit(1)).as("n_vectors"), avg("sq_err").as("mean_sq_err"))
  }

  /** Bounded driver-side training sample (corpus-size independent): the
    * first `sampleSize` vectors by id, as doubles. Shared by [[train]] and
    * PqIndex.train so composed training collects the sample ONCE.
    */
  private[operators] def collectSample(spark: SparkSession, embeddings: DataFrame,
                                       sampleSize: Int): Array[Array[Double]] = {
    import spark.implicits._
    embeddings.orderBy("vec_id").limit(sampleSize)
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
  }

  /** Train the coarse quantizer: deterministic k-means (init = first k
    * vectors by id, `iters` Lloyd steps) on a driver-side sample.
    */
  def train(spark: SparkSession, embeddings: DataFrame, k: Int,
            iters: Int = 5, sampleSize: Int = 2048): Model =
    trainFromSample(collectSample(spark, embeddings, sampleSize), k, iters)

  /** [[train]] body over a pre-collected sample. */
  private[operators] def trainFromSample(sample: Array[Array[Double]], k: Int,
                                         iters: Int): Model = {
    require(sample.length >= k, s"need >= $k sample vectors")
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val dims = centroids(0).length
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          val lim = math.min(dims, v.length) // ragged vectors: missing tail = 0
          while (i < lim) { val t = centroids(c)(i) - v(i); d += t * t; i += 1 }
          while (i < dims) { val t = centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        val lim = math.min(dims, v.length)
        while (i < lim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    Model(centroids)
  }

  /** Assign every corpus vector to its cell (narrow map, no shuffle). */
  def assign(spark: SparkSession, embeddings: DataFrame, model: Model): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    embeddings.select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
      .map { case (id, label, e) => (id, label, e, bc.value.nearestCell(e)) }
      .toDF("vec_id", "label", "embedding", "cell")
  }

  /** Persist a trained index as a durable build-once artifact (the
    * reference's index is created once, idempotently, and queried forever —
    * db_utils.py:48,120-127; this is the engine's equivalent lifecycle):
    *
    *   `path/model`   — centroid sidecar, one row per cell (tiny; loaded to
    *                    the driver at probe time like any ANN model);
    *   `path/vectors` — the assigned corpus, parquet PARTITIONED BY cell —
    *                    the layout SCALE.md promises: a probe's
    *                    `cell IN (...)` filter becomes source-level
    *                    partition pruning, so `nProbe` of `nCells`
    *                    directories are ever listed or read.
    *
    * No training, encoding, or corpus scan happens after this write.
    */
  def save(spark: SparkSession, model: Model, assigned: DataFrame, path: String): Unit = {
    saveModel(spark, model, s"$path/model")
    assigned.write.partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Write just the centroid sidecar — [[save]]'s model half, reused by the
    * retrain path which publishes a NEW model version behind a
    * [[graft.sources.Versioned]] pointer instead of overwriting in place.
    */
  private[graft] def saveModel(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write.parquet(dir)
  }

  /** Resolve the current model directory: the [[graft.sources.Versioned]]
    * pointer once a retrain has published one, else the original `model`
    * sidecar [[save]] writes (backward compatible, like [[vectorsDir]]).
    */
  private[graft] def modelDir(path: String): String =
    graft.sources.Versioned.readPointer(path, "model")
      .map(c => s"$path/${c.dir}").getOrElse(s"$path/model")

  /** Load the centroid sidecar back into a [[Model]]. Doubles round-trip
    * parquet exactly, so the loaded model is bitwise the trained one
    * (asserted in IndexStoreSpec) — probe results cannot drift from the
    * build-time model.
    */
  def loadModel(spark: SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(modelDir(path))
      .select("cell", "centroid").as[(Int, Seq[Double])]
      .collect().sortBy(_._1)
    Model(rows.map(_._2.toArray))
  }

  /** Resolve the current vectors directory: the [[graft.sources.Versioned]]
    * pointer when a compaction has published one, else the original
    * `vectors` layout [[save]] writes — backward compatible, so existing
    * artifacts read unchanged until their first compaction.
    */
  private[graft] def vectorsDir(path: String): String =
    graft.sources.Versioned.readPointer(path, "vectors")
      .map(c => s"$path/${c.dir}").getOrElse(s"$path/vectors")

  /** The persisted corpus with its `cell` partition column — feed straight
    * into [[search]] for a probe-only query (no training scan in the plan).
    */
  def loadVectors(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(vectorsDir(path))

  /** Approximate top-k: scan only the `nProbe` cells nearest to the query
    * vector, exact cosine within them.
    */
  def search(spark: SparkSession, assigned: DataFrame, model: Model,
             query: Seq[Float], k: Int, nProbe: Int): DataFrame = {
    val cells = model.nearestCells(query, nProbe)
    val qCol = lit(query.toArray).cast("array<float>")
    assigned
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"), col("label"),
        round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"), qCol), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }
}
