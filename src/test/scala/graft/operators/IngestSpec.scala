package graft.operators

import graft.SparkTestBase
import graft.schemas.Schemas
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IngestSpec extends SparkTestBase {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("pipeline output matches the canonical 10-field chunk-store schema") {
    val out = Ingest.pipeline(spark, docs)
    assert(out.schema.fieldNames.toSeq == Schemas.chunkStore.fieldNames.toSeq)
    assert(out.count() > 0)
  }

  test("pipeline is deterministic (two runs, identical rows)") {
    val a = Ingest.pipeline(spark, docs).drop("timestamp").orderBy("id")
    val b = Ingest.pipeline(spark, docs).drop("timestamp").orderBy("id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dedup idempotence: ingest(x ++ x) == ingest(x) on text_hash set") {
    val doubled = docs.unionAll(docs)
    val once = Ingest.pipeline(spark, docs).select("text_hash").distinct()
    val twice = Ingest.pipeline(spark, doubled).select("text_hash").distinct()
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    // and dedup keeps exactly one row per hash
    val cnts = Ingest.pipeline(spark, doubled).groupBy("text_hash").count()
      .filter(col("count") > 1).count()
    assert(cnts == 0)
  }

  test("dedup survivor is deterministic first-arrival (min filename, chunk_id)") {
    import spark.implicits._
    val chunks = Seq(
      ("b_src_1_0", "same text", "b_src", 0, "h1", 1),
      ("a_src_5_0", "same text", "a_src", 0, "h1", 1),
      ("a_src_5_1", "other", "a_src", 1, "h2", 2)
    ).toDF("id", "content", "filename", "chunk_id", "text_hash", "page_number")
    val out = Ingest.dedupExactDeterministic(chunks, Seq("filename", "chunk_id", "id"))
    val survivors = out.select("id").as[String].collect().toSet
    assert(survivors == Set("a_src_5_0", "a_src_5_1"))
  }

  test("cross-load dedup drops only already-present hashes") {
    import spark.implicits._
    val existing = Seq("h1", "h3").toDF("text_hash")
    val fresh = Seq(("x", "h1"), ("y", "h2")).toDF("id", "text_hash")
    val out = Ingest.dedupAgainstExisting(fresh, existing)
    assert(out.select("id").as[String].collect().toSeq == Seq("y"))
  }

  test("bloom-prefiltered cross-load dedup equals the exact anti-join at every geometry") {
    import spark.implicits._
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
    val fresh = hashed.filter(col("doc_id") >= 250)
    val existing = hashed.filter(col("doc_id") < 250)
    val exact = Ingest.dedupAgainstExisting(fresh, existing)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // roomy filter (few FPs), tight filter (some FPs), and a SATURATED
    // 64-bit filter where every probe is a false positive and every fresh
    // row must survive the exact verification stage — exactness must hold
    // across all three
    for (m <- Seq(1 << 20, 1 << 10, 64)) {
      val got = Ingest.bloomDedupAgainstExisting(fresh, existing, mBits = m)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == exact, s"mBits=$m")
    }
  }

  test("bloom prefilter preserves duplicate rows and routes a definite-new sliver") {
    import spark.implicits._
    val fresh = Seq(("x", "h1"), ("y", "h2"), ("y2", "h2")).toDF("id", "text_hash")
    val existing = Seq("h1").toDF("text_hash")
    val out = Ingest.bloomDedupAgainstExisting(fresh, existing)
    // h2 appears twice in fresh and must appear twice in the output (parity
    // with the plain anti-join, which never collapses identical rows)
    assert(out.select("id").as[String].collect().sorted.toSeq == Seq("y", "y2"))
    // with a roomy mask, at least one of the two h2 rows skips verification:
    // the definitely-new branch is a pure filter, so its rows appear even
    // if the existing side were unavailable — proxy: empty existing yields
    // everything back via the filter path alone
    val all = Ingest.bloomDedupAgainstExisting(fresh, existing.limit(0))
    assert(all.count() == 3)
  }

  test("zero-vector fallback on embedder failure (ref embedding_utils.py:207-213)") {
    import spark.implicits._
    val chunks = Ingest.chunkDocuments(spark, docs.limit(5))
    val out = Ingest.withEmbeddings(spark, chunks, new FailingEmbedder())
    val norms = out.select(graft.functions.VectorFunctions.normSq(col("content_vector")).as("n"))
      .as[Double].collect()
    assert(norms.nonEmpty && norms.forall(_ == 0.0))
    // dimensionality preserved even on failure
    val sizes = out.select(size(col("content_vector"))).as[Int].collect()
    assert(sizes.forall(_ == Schemas.VectorDimensions))
  }

  test("dead-letter split routes bad rows without failing the job (A22)") {
    import spark.implicits._
    val mixed = Seq(
      (1L, "good text here", "en", "s1", 14L),
      (2L, null.asInstanceOf[String], "en", "s1", 0L),
      (3L, "   ", "en", "s2", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val (good, dead) = Ingest.withDeadLetter(mixed)
    assert(good.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val reasons = dead.select("doc_id", "error").as[(Long, String)].collect().toMap
    assert(reasons == Map(2L -> "null_text", 3L -> "empty_text"))
    // good side flows through the pipeline unchanged
    assert(Ingest.pipeline(spark, good).count() > 0)
  }

  test("approx_count_distinct stays within 5% of exact (HLL sanity)") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct("l_orderkey").as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("chunk ids are sanitized and carry provenance") {
    import spark.implicits._
    val out = Ingest.chunkDocuments(spark, docs.limit(20)).toDF()
    val ids = out.select("id").as[String].collect()
    assert(ids.forall(_.matches("[a-zA-Z0-9_\\-=]+")))
    val chunkIds = out.filter(col("chunk_id") === 0).count()
    assert(chunkIds == out.select("filename", "id").filter(col("chunk_id") === 0).count())
  }

  test("fallback key: deterministic content-hash suffix, existing keys untouched") {
    import spark.implicits._
    val rows = Seq(
      (null.asInstanceOf[String], "some chunk text", "report.pdf", 0),
      ("", "other text", "report.pdf", 1),
      ("keep_me", "third text", "report.pdf", 2)
    ).toDF("id", "content", "filename", "chunk_id")
    val out = Ingest.withFallbackKey(rows).orderBy("chunk_id")
      .select("id").as[String].collect()
    // suffix = first 6 hex of md5(content); dot in filename sanitized to _
    assert(out(0) == "report_pdf_0_" + graft.text.TextKernel.md5Hex("some chunk text").take(6))
    assert(out(1) == "report_pdf_1_" + graft.text.TextKernel.md5Hex("other text").take(6))
    assert(out(2) == "keep_me")
    // re-run stability (the reason the suffix is NOT uuid4 like the ref)
    val again = Ingest.withFallbackKey(rows).orderBy("chunk_id")
      .select("id").as[String].collect()
    assert(out.sameElements(again))
  }
}
