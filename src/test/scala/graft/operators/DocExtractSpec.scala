package graft.operators

import graft.SparkTestBase

class DocExtractSpec extends SparkTestBase {

  private val longPage = "this page has plenty of extracted text content " * 5
  private val shortPage = "tiny"

  test("page extraction splits on form-feed and flags short pages for OCR (A2/A5)") {
    import spark.implicits._
    val docs = Seq((1L, (longPage + "\f" + shortPage).getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val pages = DocExtract.extractPages(spark, docs).orderBy("page").collect()
    assert(pages.length == 2)
    assert(pages(0).getInt(1) == 1 && !pages(0).getBoolean(4))
    assert(pages(1).getInt(1) == 2 && pages(1).getBoolean(4)) // < 100 chars → OCR
  }

  test("table lines are extracted as stringified tables (A4)") {
    import spark.implicits._
    val pageWithTable = longPage + "\ncol1\tcol2\tcol3\nv1\tv2\tv3\ntail text"
    val docs = Seq((3L, pageWithTable.getBytes("UTF-8"))).toDF("doc_id", "content")
    val pages = DocExtract.extractPages(spark, docs).collect()
    assert(pages.length == 1)
    val tables = pages(0).getString(3)
    assert(tables.contains("col1 col2 col3") && tables.contains("v1 v2 v3"))
    assert(!pages(0).getString(2).contains("col1")) // pulled out of page text
    val assembled = DocExtract.assembleWithOcr(spark, DocExtract.extractPages(spark, docs)).collect()
    assert(assembled(0).getString(1).contains("[Page 1 Table]:"))
  }

  test("assembly tags fragments with page provenance and OCR marker (A5/A6)") {
    import spark.implicits._
    val docs = Seq((7L, (longPage + "\f" + shortPage).getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val pages = DocExtract.extractPages(spark, docs)
    val out = DocExtract.assembleWithOcr(spark, pages).collect()
    assert(out.length == 1)
    val text = out(0).getString(1)
    assert(text.contains("[Page 1 Text]:"))
    assert(text.contains("[Page 2 OCR Text]:")) // short page went through OCR stub
    assert(text.contains("ocr_text_"))
    // page order preserved, joined by blank line (ref :167)
    assert(text.indexOf("[Page 1") < text.indexOf("[Page 2"))
    assert(text.contains("\n\n"))
  }

  test("extractor never throws on garbage bytes (A22 containment)") {
    import spark.implicits._
    val docs = Seq((1L, Array[Byte](-1, -2, -3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "content")
    val pages = DocExtract.extractPages(spark, docs)
    assert(pages.count() >= 0) // executes without exception; null doc → no pages
    assert(pages.filter("doc_id = 2").count() == 0)
  }

  test("chunk_text Generator (SQL surface) matches Dataset.flatMap chunking") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.load(spark, sf, "documents").limit(50)
    docs.createOrReplaceTempView("docs_gen_spec")
    val viaSql = spark.sql(
      """SELECT doc_id, c.chunk_id, c.chunk FROM docs_gen_spec
        |LATERAL VIEW chunk_text(text) c AS chunk_id, chunk""".stripMargin)
      .as[(Long, Int, String)].collect().toSet
    val viaFlatMap = docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.text.Chunker.chunkText(text).zipWithIndex.map { case (c, i) => (id, i, c) }
      }.collect().toSet
    assert(viaSql == viaFlatMap)
  }

  test("observe metrics count chunks without an extra pass (A19)") {
    val docs = graft.sources.Tables.load(spark, sf, "documents").limit(30)
    val canonical = Ingest.pipeline(spark, docs)
    val (observed, obs) = Metrics.observeIngest(canonical)
    val n = observed.count()
    val row = obs.get
    assert(row("n_chunks") == n)
    assert(row("n_zero_vectors") == 0L)
    assert(row("total_chars").asInstanceOf[Long] > 0L)
  }

  test("assembleWithProvenance: page_starts land exactly on each page's fragment tag") {
    import spark.implicits._
    // three pages: long text / short (OCR-bound) / tabled — all tag shapes
    val content = ("alpha beta gamma " * 20) + "\fshort\fcol1\tcol2\nplain line"
    val docs = Seq((1L, content.getBytes("UTF-8"))).toDF("doc_id", "content")
    val prov = DocExtract.assembleWithProvenance(spark,
      DocExtract.extractPages(spark, docs))
      .as[(Long, String, Seq[(Int, Int)])].head()
    val (_, documentText, starts) = prov
    // same assembled text as the un-provenance'd path
    val plain = DocExtract.assembleWithOcr(spark,
      DocExtract.extractPages(spark, docs))
      .select("document_text").as[String].head()
    assert(documentText == plain)
    val norm = graft.text.TextKernel.normalize(documentText)
    assert(starts.map(_._1) == Seq(1, 2, 3))
    starts.foreach { case (page, off) =>
      assert(norm.substring(off - 1).startsWith(s"[Page $page"),
        s"page $page start $off does not sit on its fragment tag")
    }
    // chunk offsets and fragment offsets share the coordinate space: the
    // chunk containing each fragment start maps back to that page
    val chunks = graft.text.Chunker.chunkWithOffsets(documentText)
    starts.foreach { case (page, off) =>
      val covering = chunks.filter(c => c._2 <= off && off < c._3)
      assert(covering.nonEmpty, s"no chunk covers page-$page start $off")
    }
  }
}
