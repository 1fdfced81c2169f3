package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The sharded-IVF composition contracts (SCALE.md round-13 §1: the
  * design path past the single-index broadcast boundary, as code):
  * disjoint-total membership, exactness under full probing, recall
  * under the default pruned probe, and per-shard model independence.
  */
class ShardedIvfSpec extends SparkTestBase {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private def exactTop(k: Int, qid: Long, qv: Seq[Float]): Seq[Long] = {
    import spark.implicits._
    emb.filter(col("vec_id") =!= qid)
      .select(col("vec_id"),
        round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"),
          lit(qv.toArray).cast("array<float>")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(k)
      .select("vec_id").as[Long].collect().toSeq
  }

  test("shard membership is disjoint and total; full probe equals brute force") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_shivf").toString + "/ix"
    val shards = 3
    ShardedIvf.build(spark, emb, root, shards, nCellsPerShard = 8)
    // disjoint + total: every vec_id in exactly one shard artifact
    val ids = (0 until shards).map { r =>
      IvfIndex.loadVectors(spark, s"$root/shard=$r")
        .select("vec_id").as[Long].collect().toSet
    }
    assert(ids.map(_.size).sum == emb.count(),
      "shards must partition the corpus without loss or duplication")
    for (a <- 0 until shards; b <- (a + 1) until shards)
      assert(ids(a).intersect(ids(b)).isEmpty, s"shards $a/$b overlap")
    // probing EVERY cell of EVERY shard is the exact brute-force top-k:
    // sharding is total, so unlike cell pruning it cannot lose a result
    val (qid, qv) = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].head()
    val all = (0 until shards).map { r =>
      val m = IvfIndex.loadModel(spark, s"$root/shard=$r")
      IvfIndex.search(spark,
        IvfIndex.loadVectors(spark, s"$root/shard=$r").filter(col("vec_id") =!= qid),
        m, qv, k = 10, nProbe = m.centroids.length)
    }.reduce(_ unionAll _)
      .orderBy(desc("sim"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == exactTop(10, qid, qv))
  }

  test("default pruned probe keeps useful recall and peaks at one shard's model") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_shivf2").toString + "/ix"
    val shards = 3
    ShardedIvf.build(spark, emb, root, shards, nCellsPerShard = 8)
    assert(ShardedIvf.totalCells(spark, root, shards) == 24)
    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    var hit = 0
    var total = 0
    queries.foreach { case (qid, qv) =>
      val exact = exactTop(10, qid, qv).toSet
      val approx = ShardedIvf.search(spark, root, shards, qv, k = 11)
        .filter(col("vec_id") =!= qid).limit(10)
        .select("vec_id").as[Long].collect().toSet
      hit += (exact & approx).size
      total += exact.size
    }
    val recall = hit.toDouble / total
    // auto-nProbe floor (4 of 8 cells per shard) probes half of each
    // shard: the union composition must not score below the
    // single-index nProbe=4/16 bound (IvfIndexSpec's 0.3)
    assert(recall >= 0.3, s"sharded recall@10 over 5 queries = $recall")
  }

  test("build leaves no corpus-sized scratch and attaches the lifecycle plane") {
    val root = java.nio.file.Files.createTempDirectory("graft_shivf_lc").toString + "/ix"
    ShardedIvf.build(spark, emb, root, shards = 2, nCellsPerShard = 8)
    // the tagged staging table is deleted once every shard owns its vectors
    assert(!new java.io.File(s"$root/tagged").exists(),
      "shard-tagging scratch must not survive the build")
    // every shard artifact carries the SAME maintenance plane as a single
    // index: qerr watermark log + semantics-versioned baseline sidecar
    for (r <- 0 until 2) {
      assert(new java.io.File(s"$root/shard=$r/qerr").exists(), s"shard $r: no qerr log")
      assert(new java.io.File(s"$root/shard=$r/qerr.BASELINE").exists(),
        s"shard $r: no drift baseline")
    }
  }

  test("ensureShardedIvf publishes atomically and short-circuits when complete") {
    val idxRoot = java.nio.file.Files.createTempDirectory("graft_shivf_ens").toString
    val prev = spark.conf.getOption(graft.sources.VectorIndexStore.RootConf)
    spark.conf.set(graft.sources.VectorIndexStore.RootConf, idxRoot)
    try {
      val path = graft.sources.VectorIndexStore.ensureShardedIvf(spark, sf, shards = 2)
      assert(new java.io.File(s"$path/_SUCCESS").exists(), "no completeness marker")
      val m0 = IvfIndex.loadModel(spark, s"$path/shard=0")
      // second ensure short-circuits on the marker: no rebuild, model file
      // untouched (same mtimes ⇒ no writes happened)
      val mtimes = new java.io.File(path).listFiles().map(f => f.getName -> f.lastModified).toMap
      val again = graft.sources.VectorIndexStore.ensureShardedIvf(spark, sf, shards = 2)
      assert(again == path)
      val after = new java.io.File(path).listFiles().map(f => f.getName -> f.lastModified).toMap
      assert(after == mtimes, "idempotent ensure must not rewrite the artifact")
      IvfIndex.loadModel(spark, s"$path/shard=0").centroids
        .zip(m0.centroids).foreach { case (a, b) => assert(a.sameElements(b)) }
    } finally prev match {
      case Some(p) => spark.conf.set(graft.sources.VectorIndexStore.RootConf, p)
      case None => spark.conf.unset(graft.sources.VectorIndexStore.RootConf)
    }
  }

  test("append hash-routes to shards, stays disjoint-total, preserves full-probe exactness") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_shivf_app").toString + "/ix"
    val shards = 3
    val base = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    ShardedIvf.build(spark, base, root, shards, nCellsPerShard = 8)
    ShardedIvf.append(spark, root, shards, batch)
    // membership over the UNION stays disjoint and total
    val ids = (0 until shards).map { r =>
      IvfIndex.loadVectors(spark, s"$root/shard=$r")
        .select("vec_id").as[Long].collect().toSet
    }
    assert(ids.map(_.size).sum == emb.count(),
      "appended corpus must still partition without loss or duplication")
    for (a <- 0 until shards; b <- (a + 1) until shards)
      assert(ids(a).intersect(ids(b)).isEmpty, s"shards $a/$b overlap after append")
    // redelivered batch: the per-shard anti-join makes the append a no-op
    ShardedIvf.append(spark, root, shards, batch)
    assert((0 until shards).map(r =>
      IvfIndex.loadVectors(spark, s"$root/shard=$r").count()).sum == emb.count(),
      "redelivery must not double-insert")
    // full probe over all shards is STILL the brute-force top-k
    val (qid, qv) = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].head()
    val all = (0 until shards).map { r =>
      val m = IvfIndex.loadModel(spark, s"$root/shard=$r")
      IvfIndex.search(spark,
        IvfIndex.loadVectors(spark, s"$root/shard=$r").filter(col("vec_id") =!= qid),
        m, qv, k = 10, nProbe = m.centroids.length)
    }.reduce(_ unionAll _)
      .orderBy(desc("sim"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == exactTop(10, qid, qv),
      "full-probe exactness must survive the append lifecycle")
  }

  test("compactShards bounds per-cell file counts and preserves probe results") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_shivf_cmp").toString + "/ix"
    val shards = 2
    val base = emb.filter(col("vec_id") < 300)
    ShardedIvf.build(spark, base, root, shards, nCellsPerShard = 8)
    // three append batches fragment every touched cell directory
    for (lo <- Seq(300, 360, 420))
      ShardedIvf.append(spark, root, shards,
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 60))
    val (qid, qv) = emb.filter(col("vec_id") === 1)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].head()
    val before = ShardedIvf.search(spark, root, shards, qv, k = 10)
      .filter(col("vec_id") =!= qid)
      .select("vec_id").as[Long].collect().toSeq
    // count the RESOLVED vectors table only (compaction publishes a new
    // Versioned dir and keeps the legacy one for in-flight readers)
    def partFiles(r: Int): Int = {
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      count(new java.io.File(IvfIndex.vectorsDir(s"$root/shard=$r")))
    }
    val filesBefore = (0 until shards).map(partFiles).sum
    ShardedIvf.compactShards(spark, root, shards)
    val filesAfter = (0 until shards).map(partFiles).sum
    assert(filesAfter < filesBefore,
      s"compaction must cut files: $filesBefore -> $filesAfter")
    val after = ShardedIvf.search(spark, root, shards, qv, k = 10)
      .filter(col("vec_id") =!= qid)
      .select("vec_id").as[Long].collect().toSeq
    assert(after == before, "compaction must not change probe results")
  }

  test("retrainIfNeeded is per-shard: quiet index is a no-op, drifted shards retrain") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_shivf_rt").toString + "/ix"
    val shards = 2
    ShardedIvf.build(spark, emb, root, shards, nCellsPerShard = 8)
    assert(ShardedIvf.retrainIfNeeded(spark, root, shards) == 0,
      "fresh artifact must not retrain")
    // a strongly shifted batch drifts every shard's qerr past the factor
    val drifted = emb.select((col("vec_id") + 10000L).as("vec_id"), col("label"),
      transform(col("embedding"), x => x + lit(8.0f))
        .cast("array<float>").as("embedding"))
    ShardedIvf.append(spark, root, shards, drifted)
    val retrained = ShardedIvf.retrainIfNeeded(spark, root, shards)
    assert(retrained == shards, s"both drifted shards should retrain, got $retrained")
    assert(ShardedIvf.retrainIfNeeded(spark, root, shards) == 0,
      "retrain must reset each shard's baseline (second call is a no-op)")
  }

  test("shards train independently: models differ and rebuild deterministically") {
    val root = java.nio.file.Files.createTempDirectory("graft_shivf3").toString + "/ix"
    ShardedIvf.build(spark, emb, root, shards = 2, nCellsPerShard = 8)
    val m0 = IvfIndex.loadModel(spark, s"$root/shard=0")
    val m1 = IvfIndex.loadModel(spark, s"$root/shard=1")
    assert(m0.centroids.map(_.toSeq).toSeq != m1.centroids.map(_.toSeq).toSeq,
      "independent shards over different data must not share a model")
    val root2 = java.nio.file.Files.createTempDirectory("graft_shivf4").toString + "/ix"
    ShardedIvf.build(spark, emb, root2, shards = 2, nCellsPerShard = 8)
    IvfIndex.loadModel(spark, s"$root2/shard=0").centroids
      .zip(m0.centroids).foreach { case (a, b) => assert(a.sameElements(b)) }
  }
}
