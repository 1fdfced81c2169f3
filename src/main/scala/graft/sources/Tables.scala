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

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) and plain
    * TIMESTAMP(MICROS) across fixture generations — adapt to whichever the
    * footer declares instead of assuming one:
    *
    *   - NANOS: Spark's TimestampType (microseconds) cannot represent it
    *     directly — read the raw int64 nanos via
    *     `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to micros
    *     with exact integer arithmetic (`div`, not `/`, which would round
    *     through double and shift microseconds). DuckDB's
    *     `CAST(ts AS TIMESTAMP)` truncates ns→us the same way.
    *   - MICROS (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark): cast to
    *     TimestampType under the UTC session timezone — the same instants
    *     the nanos path produced, and the type every downstream query and
    *     streaming op was built against.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock must become the UTC instant REGARDLESS of the
        // session timezone — and without mutating it (a library load must
        // not hijack every later to_timestamp in the caller's session).
        // convert_timezone rewrites the wall-clock from UTC into the
        // session zone captured at plan-build, so the session-zone NTZ→
        // LTZ cast lands on the original UTC instant; under the driver
        // entry points (UTC session) the conversion is a no-op. Callers
        // must not change the session timezone between load and action.
        val z = spark.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID)
        raw.withColumn("ts",
          expr(s"cast(convert_timezone('UTC', '$z', ts) as timestamp)"))
      case _ => raw
    }
  }

  /** Register all fixture tables as temp views for the given sf dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
