package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Behavioral assertions for the physical-layout levers behind p01/p02:
  * row-group pruning must actually skip rows at the scan, and AQE must
  * actually split the skewed join partitions. Plan-string checks alone
  * can't see either — these read executed-plan metrics.
  */
class PhysicalLayoutSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  private def finalPlan(df: DataFrame) =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Rows the parquet reader actually produced (post row-group/page
    * pruning, pre post-scan Filter). Traverses INTO query stages — AQE
    * wraps materialized stages in leaf QueryStageExec nodes that plain
    * collect() does not descend through.
    */
  private def scanRows(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    df.collect()
    def scans(p: SparkPlan): Seq[Long] = p match {
      case s: FileSourceScanExec => Seq(s.metrics("numOutputRows").value)
      case q: QueryStageExec => scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    scans(finalPlan(df)).sum
  }

  test("sorted writes enable row-group pruning: scan reads a fraction of the rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // DATE sort column: parquet pushdown does not cover the fixture's
    // TIMESTAMP_NTZ (see PhysicalLayout note)
    val lineitem = Tables.load(spark, sf01, "lineitem")
      .withColumn("l_shipdate", to_date(col("l_shipdate")))
    val total = lineitem.count()
    PhysicalLayout.writeSorted(lineitem, "l_shipdate", s"$dir/sorted",
      blockSize = PhysicalLayout.TestBlockSize)
    // same row-group geometry, random row order: every group spans the full
    // shipdate range, so min/max stats can never exclude one
    lineitem.repartition(4).write
      .option("parquet.block.size", PhysicalLayout.TestBlockSize)
      .option("parquet.page.size", 16 * 1024)
      .parquet(s"$dir/unsorted")

    def ranged(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("l_shipdate") >= lit(java.sql.Date.valueOf("1995-06-01")) &&
          col("l_shipdate") < lit(java.sql.Date.valueOf("1995-09-01")))

    val matching = ranged(s"$dir/sorted").count()
    assert(matching == ranged(s"$dir/unsorted").count())

    val sortedRead = scanRows(ranged(s"$dir/sorted"))
    val unsortedRead = scanRows(ranged(s"$dir/unsorted"))
    // unsorted layout defeats the stats entirely (reads ~everything);
    // sorted layout reads only the overlapping groups
    assert(unsortedRead >= total * 9 / 10,
      s"expected ~full scan on unsorted, read $unsortedRead of $total")
    assert(sortedRead >= matching && sortedRead * 5 < unsortedRead,
      s"expected >=5x pruning: sorted read $sortedRead, unsorted $unsortedRead")
  }

  test("p03: lang filter becomes a partition filter, not a data filter") {
    val df = graft.queries.Registry.asMap("p03_partition_pruned_scan")(spark, sf01)
    df.collect()
    val p = finalPlan(df).toString
    assert(p.contains("PartitionFilters") && p.contains("lang"), p)
    // the partition column never reaches the parquet reader as a pushed
    // data filter — pruning happened at directory-listing time
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"), p)
    val scanned = scanRows(df)
    val matching = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(scanned == matching,
      s"scan read $scanned rows, expected only the $matching en-partition rows")
  }

  test("p04: a runtime bloom filter lands under the fact scan") {
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local-scale thresholds (defaults are sized for 10 GB cluster scans)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // broadcast joins filter for free; force the shuffle join the filter
      // is designed to protect
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.queries.Registry.asMap("p04_bloom_runtime_filter")(spark, sf01)
      df.collect()
      val p = finalPlan(df).toString
      assert(p.contains("might_contain"), p)
      assert(p.contains("bloom_filter_agg"), p)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partitions of the 5-key merge join (skew=true)") {
    import spark.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // local-scale thresholds: every >8KB partition counts as skewed
      // (factor 0 disables the relative-to-median test — with 5 uniform hot
      // keys there IS no median outlier, which is exactly the case where
      // salting-free AQE splitting shines) and splits into ~8KB chunks
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // the agg above the join reuses its partitioning; splitting breaks it,
      // so AQE only splits when told the extra shuffle is worth it
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

      val df = graft.queries.Registry.asMap("p02_skew_join_agg")(spark, "/root/testdata/sf0.1")
      df.collect()
      val p = finalPlan(df).toString
      assert(p.contains("skew=true"), p)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
