package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (TESTDATA.md). Every query function receives the
  * scale-factor directory; this loader reads the parquet and registers temp
  * views so both the DataFrame API and `spark.sql` can address the tables by
  * the same names the DuckDB oracle uses.
  *
  * Parquet is the primary source (columnar scan + predicate pushdown + column
  * pruning, all Catalyst built-ins). At cluster scale the same loader would
  * point at a partitioned table root rather than one file — nothing else
  * changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (microseconds) cannot represent directly — read the raw int64 nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to micros with
    * exact integer arithmetic (`div`, not `/`, which would round through
    * double and shift microseconds). DuckDB's `CAST(ts AS TIMESTAMP)`
    * truncates ns→us the same way, keeping oracle outputs comparable.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register all fixture tables as temp views for the given sf dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
