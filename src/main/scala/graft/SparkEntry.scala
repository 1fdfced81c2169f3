package graft

import graft.operators.{HashingEmbedder, Ingest}
import graft.queries.Registry
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship end-to-end ingestion pipeline (the reference's
  * whole program, SURVEY.md §3 EP1): documents → normalize → chunk → hash →
  * dedup → embed → canonical chunk store.
  *
  * `queries`/`oracleSql` enumerate the operator inventory (SURVEY.md §2) —
  * every SQL-expressible operator carries a DuckDB oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Ingest.pipeline(spark,
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      new HashingEmbedder())

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.asMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (chunker, minhash/simhash, LSH, langid — unit-tested instead).
    */
  def oracleSql: Map[String, String] = Registry.oracles
}
