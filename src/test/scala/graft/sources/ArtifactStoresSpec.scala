package graft.sources

import graft.SparkTestBase
import graft.operators.{NearDup, PqIndex}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The non-ANN build-once artifacts (ShingleStore / MinhashStore /
  * PostingStore) and the PQ probe plan: every persisted table must equal
  * the frame computed fresh from the corpus (the oracle guards this
  * end-to-end per query; these specs localize a failure to the store), and
  * the probe plans must actually use the physical layout — row-group
  * pushdown for token probes, partition pruning for PQ cells.
  */
class ArtifactStoresSpec extends SparkTestBase {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("ShingleStore rows and df equal a fresh computation") {
    val stored = ShingleStore.rows(spark, sf)
    val fresh = ShingleStore.shingleRowsOf(docs)
    assert(stored.count() == fresh.count())
    assert(stored.except(fresh).isEmpty && fresh.except(stored).isEmpty)
    val df = ShingleStore.dfTable(spark, sf)
    val freshDf = fresh.groupBy("sh").agg(count(lit(1)).as("df"))
    assert(df.except(freshDf).isEmpty && freshDf.except(df).isEmpty)
  }

  test("MinhashStore bands/sets equal fresh computation; probed pairs identical") {
    val bands = MinhashStore.bands(spark, sf)
    val freshBands = NearDup.minhashBuckets(spark, docs)
    assert(bands.except(freshBands).isEmpty && freshBands.except(bands).isEmpty)
    val fromStore = NearDup.minhashNearDupPairsFrom(spark,
      bands, MinhashStore.shingleSets(spark, sf), threshold = 0.5)
    val direct = NearDup.minhashNearDupPairs(spark, docs, threshold = 0.5)
    assert(fromStore.collect().toSeq == direct.collect().toSeq)
  }

  test("PostingStore probe pushes the term filter into the sorted scan") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val contrib = PostingStore.bm25ContribFromIndex(spark, sf, Seq("dup", "vector"))
      contrib.collect()
      val scans = contrib.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      val postingScan = scans.find(
        _.relation.location.rootPaths.mkString(",").contains("postings"))
      assert(postingScan.isDefined, "no postings scan in the probe plan")
      // the tok IN (...) predicate reaches parquet (row-group min/max
      // pruning over the tok-sorted layout)
      assert(postingScan.get.metadata("PushedFilters").contains("In(tok"),
        s"PushedFilters: ${postingScan.get.metadata("PushedFilters")}")
      // and row-group pruning actually binds: the scan emits the surviving
      // GROUPS, not the corpus (exact filtering happens in the Filter node
      // above). Granularity is row-group-sized, so on this tiny corpus the
      // probe reads ~1 of ~5 groups (measured 2508 of 11743 rows); at real
      // posting-table sizes the same layout reads the queried terms' slice.
      val emitted = postingScan.get.metrics("numOutputRows").value
      val total = PostingStore.postings(spark, sf).count()
      assert(emitted < total / 2,
        s"probe emitted $emitted of $total postings — row-group pruning not effective")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("BM25 scores from the index equal scores from the corpus") {
    val fromIndex = PostingStore.bm25ContribFromIndex(spark, sf, Seq("dup", "vector", "stream"))
      .groupBy("id").agg(round(sum("c"), 6).as("s"))
    val fromCorpus = graft.operators.Retrieval
      .bm25Contrib(docs, "doc_id", "text", Seq("dup", "vector", "stream"))
      .groupBy("id").agg(round(sum("c"), 6).as("s"))
    assert(fromIndex.except(fromCorpus).isEmpty && fromCorpus.except(fromIndex).isEmpty)
  }

  test("incremental append equals full build and is idempotent (shingle/minhash/posting)") {
    import org.apache.spark.sql.DataFrame
    val halfA = docs.filter(col("doc_id") < 25)
    def eq(a: DataFrame, b: DataFrame): Boolean =
      a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty
    val root = java.nio.file.Files.createTempDirectory("graft_append").toString

    // shingles: build on half, append the FULL corpus (anti-join must keep
    // only the new docs), compare against a one-shot full build
    ShingleStore.build(spark, halfA, s"$root/sh_inc")
    ShingleStore.append(spark, s"$root/sh_inc", docs)
    ShingleStore.build(spark, docs, s"$root/sh_full")
    assert(eq(spark.read.parquet(s"$root/sh_inc/rows"),
      spark.read.parquet(s"$root/sh_full/rows")))
    assert(eq(spark.read.parquet(s"$root/sh_inc/df"),
      spark.read.parquet(s"$root/sh_full/df")))
    // idempotence: re-appending the same corpus changes nothing
    val before = spark.read.parquet(s"$root/sh_inc/rows").count()
    ShingleStore.append(spark, s"$root/sh_inc", docs)
    assert(spark.read.parquet(s"$root/sh_inc/rows").count() == before)

    // minhash: per-doc tables, pure append
    MinhashStore.build(spark, halfA, s"$root/mh_inc")
    MinhashStore.append(spark, s"$root/mh_inc", docs)
    MinhashStore.build(spark, docs, s"$root/mh_full")
    assert(eq(spark.read.parquet(s"$root/mh_inc/bands"),
      spark.read.parquet(s"$root/mh_full/bands")))
    assert(spark.read.parquet(s"$root/mh_inc/sets").count() ==
      spark.read.parquet(s"$root/mh_full/sets").count())

    // postings: table equality up to segment layout + derived tables exact
    PostingStore.build(spark, halfA, s"$root/pt_inc")
    PostingStore.append(spark, s"$root/pt_inc", docs)
    PostingStore.build(spark, docs, s"$root/pt_full")
    assert(eq(spark.read.parquet(s"$root/pt_inc/postings"),
      spark.read.parquet(s"$root/pt_full/postings")))
    assert(eq(spark.read.parquet(s"$root/pt_inc/df"),
      spark.read.parquet(s"$root/pt_full/df")))
    assert(eq(spark.read.parquet(s"$root/pt_inc/stats"),
      spark.read.parquet(s"$root/pt_full/stats")))
  }

  test("IVF append assigns with the existing model; probes equal one-shot assignment") {
    import spark.implicits._
    import graft.operators.IvfIndex
    val emb = Tables.load(spark, sf, "embeddings")
    val halfA = emb.filter(col("vec_id") < 250)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val model = IvfIndex.train(spark, halfA, k = 8)
    IvfIndex.save(spark, model, IvfIndex.assign(spark, halfA, model), root)
    VectorIndexStore.appendIvf(spark, root, emb)
    val stored = IvfIndex.loadVectors(spark, root)
    assert(stored.count() == emb.count())
    // idempotent
    VectorIndexStore.appendIvf(spark, root, emb)
    assert(IvfIndex.loadVectors(spark, root).count() == emb.count())
    // probe over the appended artifact == probe over a one-shot assignment
    // with the SAME model
    val query = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val fromStore = IvfIndex.search(spark, stored.filter(col("vec_id") =!= 0),
      model, query, k = 10, nProbe = 3).collect().toSeq
    val oneShot = IvfIndex.search(spark,
      IvfIndex.assign(spark, emb, model).filter(col("vec_id") =!= 0),
      model, query, k = 10, nProbe = 3).collect().toSeq
    assert(fromStore == oneShot)
  }

  test("PQ probe plan prunes the encoded scan to nProbe cell partitions") {
    import spark.implicits._
    val path = VectorIndexStore.ensurePq(spark, sf)
    val model = PqIndex.loadModel(spark, path)
    val encoded = PqIndex.loadEncoded(spark, path)
    val query = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val nProbe = 2
      val short = PqIndex.adcShortlist(spark,
        encoded.filter(col("vec_id") =!= 0), model, query, nProbe = nProbe, shortlist = 20)
      short.collect()
      val scan = short.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.head
      assert(scan.partitionFilters.nonEmpty)
      assert(scan.metrics("numPartitions").value == nProbe,
        s"PQ probe read ${scan.metrics("numPartitions").value} partitions, expected $nProbe")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
