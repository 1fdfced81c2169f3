package graft

import org.apache.spark.sql.functions._

/** The public facade delegates correctly and composes end-to-end. */
class GraftSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("ingest produces canonical rows with unit-norm embeddings") {
    Graft.install(spark)
    val out = Graft.ingest(spark, docs)
    assert(out.columns.toSeq == Seq("id", "content", "content_vector", "filename",
      "chunk_id", "text_hash", "timestamp", "file_type", "page_number", "metadata"))
    val n = out.count()
    assert(n > 0)
    // dedup happened: hashes are unique
    assert(out.select("text_hash").distinct().count() == n)
  }

  test("hashSplit covers every row exactly once and matches g04") {
    val split = docs.select(Graft.hashSplit(col("doc_id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.values.sum == docs.count())
    assert(split.keySet == Set("train", "val", "test"))
  }

  test("hashSample(16) keeps everything; hashSample(1) keeps a strict subset") {
    val all = docs.filter(Graft.hashSample(col("doc_id"), 16)).count()
    val some = docs.filter(Graft.hashSample(col("doc_id"), 1)).count()
    assert(all == docs.count())
    assert(some > 0 && some < all)
  }

  test("packSequences conserves docs and starts each group at pack 0") {
    val sized = docs.select(col("doc_id"), col("source"),
      size(split(Graft.normalize(col("text")), " ")).cast("long").as("n_tokens"))
    val packed = Graft.packSequences(sized, "n_tokens", 2048, "source", "doc_id")
    assert(packed.count() == docs.count())
    val firstPacks = packed.groupBy("source").agg(min("pack_id").as("p0"))
      .select("p0").distinct().collect().map(_.getLong(0)).toSet
    assert(firstPacks == Set(0L))
  }

  test("knn returns k strongest matches for a real query vector") {
    Graft.install(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val top = Graft.knn(emb.filter(col("vec_id") =!= 0), qv, k = 5).collect()
    assert(top.length == 5)
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sortBy(-_.toDouble)))
  }

  test("nearDupPairs + dupClusters compose") {
    val pairs = Graft.nearDupPairs(spark, docs, threshold = 0.5)
    val clusters = Graft.dupClusters(spark, pairs)
    if (pairs.isEmpty) assert(clusters.isEmpty)
    else assert(clusters.count() >= 2 * pairs.select("id_a").distinct().count() / 2)
  }

  test("facade round-3 surface: nfc, fallback key, snapshot diff") {
    import spark.implicits._
    Graft.install(spark)
    val rows = Seq((null.asInstanceOf[String], "abc", "f.txt", 0))
      .toDF("id", "content", "filename", "chunk_id")
    assert(Graft.withFallbackKey(rows).select("id").as[String].head.startsWith("f_txt_0_"))
    val prev = Seq((1L, "h1"), (2L, "h2")).toDF("doc_id", "text_hash")
    val cur = Seq((2L, "h2x"), (3L, "h3")).toDF("doc_id", "text_hash")
    val st = Graft.snapshotDiff(prev, cur).as[(Long, String)].collect().toMap
    assert(st == Map(1L -> "deleted", 2L -> "changed", 3L -> "added"))
    assert(rows.select(Graft.nfcNormalize(lit("abc")).as("n")).as[String].head == "abc")
  }
}
