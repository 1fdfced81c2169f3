package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark (DataFrame-first) implementation plus, when
  * the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL the
  * driver hash-compares against (SURVEY.md §5.1).
  *
  * Conventions for oracle determinism (SURVEY.md §7 hard-parts):
  *   - every output column aliased identically on both sides;
  *   - a total ORDER BY (unique tie-breaker) on both sides;
  *   - UTC session timezone; timestamps cast to DATE/BIGINT in outputs when
  *     sub-second representation could differ between engines.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QuerySet {
  def queries: Seq[Q]

  /** Shorthand fixture-table loader used inside query bodies. */
  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** THE whitespace normalization (A7) — single definition of the Spark
    * column and its DuckDB-SQL equivalent, shared by every query that hashes
    * or tokenizes normalized text (d02/d04/x01/x02/t01/... must all agree).
    */
  protected def normCol: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.trim(
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.col("text"), "\\s+", " "))

  protected val normSql: String = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"

  /** Replace a raw `content_vector` array column with scalar digests
    * (dimension + rounded L2 norm). The driver's comparator sorts output
    * rows with pandas, which cannot order ndarray cells — array columns in
    * query OUTPUT crash even the rows-only check (CORRECTNESS_r01
    * d10/m06). The digests keep the embedding verifiable (dim and norm are
    * deterministic for the hashing embedder) while staying sortable.
    */
  protected def vectorDigest(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("vec_dim", size(col("content_vector")))
      .withColumn("vec_l2",
        round(graft.functions.VectorFunctions.norm(col("content_vector")), 6))
      .drop("content_vector")
  }

  /** Xor-folded xxhash64 digest over the full canonical chunk row
    * (post-[[vectorDigest]]) with every field NULL-SENTINELED: Spark's
    * multi-arg xxhash64 SKIPS null arguments (a null leaves the running
    * hash unchanged), so a raw xxhash64(a, b, ...) cannot distinguish a
    * value shifting between two nullable fields from the original row —
    * exactly the field-wiring drift class the d10/m06 digests exist to
    * catch. Each field is cast to string and coalesced to a \u0001
    * sentinel no fixture value contains.
    */
  protected def canonicalDigest: org.apache.spark.sql.Column = {
    val fields = Seq("id", "content", "vec_dim", "vec_l2", "filename",
      "chunk_id", "text_hash", "timestamp", "file_type", "page_number",
      "metadata")
    val args = fields
      .map(f => s"coalesce(CAST($f AS STRING), '\u0001')").mkString(", ")
    org.apache.spark.sql.functions.expr(s"bit_xor(xxhash64($args))")
  }

  /** GOLDEN-VALUES oracle for outputs whose generator is not
    * SQL-expressible (the recursive chunker): the expected rows are pinned
    * as literals PER FIXTURE CORPUS and selected by document count, so one
    * oracle string stays valid at every pinned SF. `schema` is
    * "name TYPE, ..." (types forced by CAST so VALUES inference can't
    * drift from the Spark side); `golden` maps corpus doc-count → literal
    * row tuples (WITHOUT the leading corpus key). An unpinned corpus
    * selects zero rows — a loud rows_match failure, never a silent pass.
    * Pinned values are produced by a verified engine run and guarded
    * upstream by the chunker parity/property suites; the gate's job is to
    * fail on any later behavioral drift.
    */
  protected def goldenBySize(schema: String,
                             golden: Map[Long, Seq[String]]): String = {
    val cols = schema.split(",").map(_.trim.split("\\s+", 2))
      .map(a => (a(0), a(1)))
    val sel = cols.map { case (n, ty) => s"CAST($n AS $ty) AS $n" }
      .mkString(", ")
    val names = cols.map(_._1).mkString(", ")
    val rows = golden.toSeq.sortBy(_._1)
      .flatMap { case (n, rs) => rs.map(r => s"($n, $r)") }
      .mkString(",\n  ")
    s"""SELECT $sel FROM (VALUES\n  $rows)
       |AS g(corpus_docs, $names)
       |WHERE corpus_docs = (SELECT count(*) FROM documents)""".stripMargin
  }
}

object Registry {
  def all: Seq[Q] = {
    val qs =
      PipelineQueries.queries ++
        RelationalQueries.queries ++
        TextQueries.queries ++
        VectorQueries.queries ++
        DedupQueries.queries ++
        StreamingQueries.queries ++
        MultimodalQueries.queries ++
        QualityQueries.queries ++
        SourceQueries.queries ++
        KeywordQueries.queries ++
        PhysicalQueries.queries
    // a duplicated name would silently shadow a query in asMap (toMap is
    // last-wins) and drop it from driver verification — fail loudly instead
    val dupes = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    qs
  }

  def asMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
