package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once INVERTED INDEX for ranked keyword retrieval — the engine-side
  * equivalent of the reference's full-text-searchable index (the store
  * declares `content` searchable and a semantic-ranking configuration on
  * the same index, db_utils.py:55-57,112-118; created once, queried
  * forever). Round 5 rebuilt postings from the raw corpus inside every
  * k01/k02 invocation; a real deployment tokenizes 100 TB once and serves
  * every query from the index.
  *
  * Artifact layout:
  *   `path/postings` — (tok, doc_id, tf, dl): one row per (term, doc),
  *                     with the doc length denormalized in (no join at
  *                     query time). Written SORTED BY tok
  *                     ([[PhysicalLayout.writeSorted]]): a query's
  *                     `tok IN (...)` predicate pushes down to parquet
  *                     row-group min/max pruning, so a probe reads the
  *                     queried terms' posting lists, not the corpus — the
  *                     inverted-index access path, expressed as physical
  *                     layout.
  *   `path/df`       — (tok, df): global document frequency (vocabulary-
  *                     sized, broadcast at query time).
  *   `path/stats`    — (n_docs, avgdl): one row.
  *
  * All three tables are exact integer/long-sum quantities computed with the
  * same tokenization as [[graft.operators.Retrieval.bm25Contrib]], so
  * scores over the store are bitwise the scores over the corpus — k01/k02
  * stay hash-green against oracles that keep recomputing from `documents`.
  */
object PostingStore {

  /** Conf key overriding the artifact root (default: system tmpdir). */
  val RootConf = "spark.graft.postings.dir"

  def path(spark: SparkSession, sfDir: String): String = {
    val root = spark.conf.getOption(RootConf)
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_postings")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      PhysicalLayout.sourceTag(sfDir, "documents")
    s"$root/pt_$tag"
  }

  /** Build the index from any (doc_id, text) frame into `dir` — the
    * corpus-general entry (pair with [[append]] for incremental corpora).
    */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val base = docs
      .select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
      .withColumn("dl", size(split(col("norm"), " ")))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(split(col("norm"), " ")).as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    // sorted by tok: row-group min/max pruning serves `tok IN (...)`
    // probes; production keeps the default 128 MiB groups
    PhysicalLayout.writeSorted(postings, "tok", s"$dir/postings")
    spark.read.parquet(s"$dir/postings")
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .write.parquet(s"$dir/df")
    base.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
      .coalesce(1).write.parquet(s"$dir/stats")
    val ok = new java.io.File(dir, "_SUCCESS").createNewFile()
    require(ok || new java.io.File(dir, "_SUCCESS").exists(),
      s"could not mark posting artifact complete at $dir")
  }

  /** Idempotent index build over the `documents` fixture: one tokenization
    * pass → tok-sorted postings + df + corpus stats, published atomically.
    */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val p = path(spark, sfDir)
    PhysicalLayout.ensureDir(p) { tmp =>
      build(spark, Tables.load(spark, sfDir, "documents"), tmp)
    }
    p
  }

  def postings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/postings")

  def dfTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/df")

  def stats(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/stats")

  /** INCREMENTAL maintenance: append new documents' postings as a fresh
    * tok-sorted segment (row-group min/max pruning is per row group, so
    * per-segment sort keeps term probes pruned without a global resort —
    * the standard segmented-index trade; compaction can re-sort segments
    * off-line), then refresh df and stats FROM the artifact (one pass over
    * persisted postings, not the corpus). Idempotent via the doc_id
    * anti-join; build(A) + append(B) ≡ build(A ∪ B) up to segment layout
    * (ArtifactStoresSpec asserts table equality and probe-score equality).
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame): Unit = {
    val existing = spark.read.parquet(s"$path/postings").select("doc_id").distinct()
    val fresh = newDocs.join(existing, Seq("doc_id"), "left_anti")
    val base = fresh
      .select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
      .withColumn("dl", size(split(col("norm"), " ")))
    base.select(col("doc_id"), col("dl"), explode(split(col("norm"), " ")).as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .repartitionByRange(4, col("tok")).sortWithinPartitions("tok")
      .write.mode("append")
      .option("parquet.block.size", PhysicalLayout.TestBlockSize)
      .option("parquet.page.size", 16 * 1024)
      .parquet(s"$path/postings")
    refreshDerived(spark, path)
  }

  // df is additive and stats are a weighted average — both are exactly
  // recomputable from the artifact itself (every doc has >= 1 posting row,
  // dl is constant per doc), so the refresh never rereads the corpus
  private def refreshDerived(spark: SparkSession, path: String): Unit = {
    val postings = spark.read.parquet(s"$path/postings")
    def swapIn(name: String, df: DataFrame): Unit = {
      val tmp = s"$path/$name.tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}"
      df.write.parquet(tmp)
      import scala.reflect.io.Directory
      new Directory(new java.io.File(s"$path/$name")).deleteRecursively()
      require(new java.io.File(tmp).renameTo(new java.io.File(s"$path/$name")),
        s"could not publish refreshed $name table at $path")
    }
    swapIn("df", postings.groupBy("tok").agg(count(lit(1)).as("df")))
    swapIn("stats", postings.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
      .coalesce(1))
  }

  /** Per-(doc, term) BM25 contribution served FROM the index: filter the
    * sorted postings to `terms` (row-group pruned scan), broadcast-join the
    * term df rows and the single stats row — the same Lucene-smoothed
    * formula as [[graft.operators.Retrieval.bm25Contrib]], over identical
    * integer inputs. Returns (id, c).
    */
  def bm25ContribFromIndex(spark: SparkSession, sfDir: String, terms: Seq[String],
                           k1: Double = graft.operators.Retrieval.DefaultK1,
                           b: Double = graft.operators.Retrieval.DefaultB): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tf = postings(spark, sfDir).filter(col("tok").isin(terms: _*))
    val df = dfTable(spark, sfDir).filter(col("tok").isin(terms: _*))
    tf.join(broadcast(df), "tok").crossJoin(broadcast(stats(spark, sfDir)))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .select(col("doc_id").as("id"), (col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))).as("c"))
  }
}
