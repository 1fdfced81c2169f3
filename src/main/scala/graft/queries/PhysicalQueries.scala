package graft.queries

import graft.sources.PhysicalLayout
import org.apache.spark.sql.functions._

/** Physical-layout / adaptive-execution demonstrations — queries whose
  * RESULTS are plain oracle-checkable aggregations but whose point is the
  * physical behavior under them (row-group pruning, AQE skew-join
  * splitting), asserted behaviorally in PhysicalLayoutSpec.
  */
object PhysicalQueries extends QuerySet {

  private val rangeLo = java.sql.Date.valueOf("1995-06-01")
  private val rangeHi = java.sql.Date.valueOf("1995-09-01")

  /** Per-type value multipliers for the skew-join demo (inline dimension —
    * the canonical low-cardinality hot-key join: 5 distinct keys fan a
    * 100k-row fact table into 5 hot shuffle partitions).
    */
  private[graft] val typeWeights = Seq(
    ("click", 2.0), ("error", 0.0), ("purchase", 10.0),
    ("signup", 5.0), ("view", 1.0))

  override def queries: Seq[Q] = Seq(

    // Min/max row-group pruning via sort-on-write: the query reads a
    // RANGE-SORTED parquet copy of lineitem with a ~4%-selective shipdate
    // range. Same answer as scanning the raw table (the oracle does), but
    // the sorted copy's scan touches only the row groups overlapping the
    // range — PhysicalLayoutSpec asserts the scan-node row counts sorted
    // vs unsorted. The day-granular ship timestamp is stored as DATE in
    // the copy: parquet pushdown covers DATE but not TIMESTAMP_NTZ (see
    // PhysicalLayout note), and it halves the column's footprint.
    Q("p01_sorted_scan_prune",
      (s, d) => {
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_") +
          "_" + PhysicalLayout.sourceTag(d, "lineitem")
        val sorted = s"/tmp/graft_p01/lineitem_by_shipdate_$tag"
        // TestBlockSize EXPLICITLY: this query demonstrates multi-group
        // pruning at fixture scale, where the production 128 MiB default
        // would put the whole table in one group and show nothing
        PhysicalLayout.ensureSortedCopy(sorted, "l_shipdate",
            blockSize = PhysicalLayout.TestBlockSize) {
          t(s, d, "lineitem").withColumn("l_shipdate", to_date(col("l_shipdate")))
        }
        s.read.parquet(sorted)
          .filter(col("l_shipdate") >= lit(rangeLo) && col("l_shipdate") < lit(rangeHi))
          .groupBy("l_returnflag")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-09-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // AQE skew-join shape: a sort-merge join on a 5-key fact column (every
    // key is a hot partition). The merge hint keeps the tiny dimension out
    // of a broadcast so the skewed shuffle join is what executes; under
    // AQE's skew thresholds each hot partition splits into parallel chunks
    // with the dim side duplicated (no salting needed) —
    // PhysicalLayoutSpec asserts the skew=true marker fires.
    Q("p02_skew_join_agg",
      (s, d) => {
        import s.implicits._
        val dim = typeWeights.toDF("event_type", "weight")
        // AQE splits a skewed reduce partition along MAP-output boundaries,
        // so splitting needs >1 upstream map task per hot key. The fixture
        // is one small file (one mapper — unsplittable); 16 partitions
        // stand in for the thousands of mappers a 100 TB fact scan has.
        t(s, d, "events").repartition(16)
          .join(dim.hint("merge"), "event_type")
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            round(sum(col("value") * col("weight")), 2).as("weighted_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value * CASE event_type
        |   WHEN 'click' THEN 2.0 WHEN 'error' THEN 0.0
        |   WHEN 'purchase' THEN 10.0 WHEN 'signup' THEN 5.0
        |   WHEN 'view' THEN 1.0 END), 2) AS weighted_value
        |FROM events
        |WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Directory partition pruning (hive-style partitionBy layout — the
    // companion lever to p01's row-group pruning): the documents table is
    // written once partitioned by lang, and the lang = 'en' query resolves
    // to PartitionFilters at planning time — non-matching directories are
    // never listed into the scan. At 100 TB, partition columns carry the
    // coarse pruning (date/source/lang) and row-group stats the fine
    // pruning within each directory. PhysicalLayoutSpec asserts the
    // PartitionFilters plan shape and that no pushed data filter remains.
    Q("p03_partition_pruned_scan",
      (s, d) => {
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_") +
          "_" + PhysicalLayout.sourceTag(d, "documents")
        val path = s"/tmp/graft_p03/docs_by_lang_$tag"
        PhysicalLayout.ensureDir(path)(p =>
          t(s, d, "documents").write.partitionBy("lang").mode("overwrite").parquet(p))
        s.read.parquet(path)
          .filter(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin)),

    // Runtime bloom-filter injection: fact ⋈ selectively-filtered dim on a
    // non-partition key — Spark builds a bloom filter from the dim's
    // surviving keys at runtime and applies it as a might_contain predicate
    // UNDER the fact scan, so most fact rows die before the join shuffle.
    // At 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~selectivity fraction that can match. Default
    // thresholds (10 GB application side) are cluster-sized, so injection
    // is asserted in PhysicalLayoutSpec under tuned confs, like p02's
    // skew split.
    Q("p04_bloom_runtime_filter",
      (s, d) => {
        val urgent = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        t(s, d, "lineitem")
          .join(urgent, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Dynamic partition pruning: the fact side is PARTITIONED on the join
    // key (directory-per-flag layout) and the dimension side carries a
    // selective filter — at runtime Spark turns the dim's surviving keys
    // into a partition filter (`dynamicpruning` subquery reusing the
    // broadcast), so only 1 of 3 fact partitions is ever read. The
    // completion of the runtime-filter family next to p04's bloom filter
    // (key-level) and p03's static pruning (literal predicate); at 100 TB
    // DPP is what makes star-schema joins read the 2% of partitions that
    // can match. Plan asserted in PlanSpec ("dynamicpruning" under
    // PartitionFilters).
    Q("p05_dynamic_partition_pruning",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_") +
          "_" + PhysicalLayout.sourceTag(d, "lineitem")
        val path = s"/tmp/graft_p05/lineitem_by_flag_$tag"
        PhysicalLayout.ensureDir(path)(p =>
          t(s, d, "lineitem").write.partitionBy("l_returnflag")
            .mode("overwrite").parquet(p))
        // the dim must be FILE-backed: a local in-memory relation gets its
        // filter constant-folded away, and the DPP rule then sees no
        // selective predicate to derive a partition filter from
        val dimPath = s"/tmp/graft_p05/flag_dim_$tag"
        PhysicalLayout.ensureDir(dimPath)(p =>
          Seq(("A", "accepted"), ("N", "none"), ("R", "returned"))
            .toDF("flag", "flag_label").write.mode("overwrite").parquet(p))
        val dim = s.read.parquet(dimPath).filter(col("flag_label") === "returned")
        s.read.parquet(path)
          .join(dim, col("l_returnflag") === col("flag"))
          .groupBy("flag_label")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy("flag_label")
      },
      Some("""SELECT 'returned' AS flag_label, CAST(count(*) AS BIGINT) AS n_items,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY 1 ORDER BY flag_label""".stripMargin)),

    // File provenance via the hidden _metadata column: every row carries
    // its physical origin (file_path, file_name, size, mod time) with NO
    // schema change to the data — the lineage hook a 100 TB pipeline needs
    // for bad-file quarantine and per-ingest audits. Here the partition
    // value is parsed back out of each row's file_path over p03's
    // partitioned layout; per-file counts would be write-parallelism-
    // dependent, so the (deterministic) aggregate is per partition value.
    Q("p06_metadata_provenance",
      (s, d) => {
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_") +
          "_" + PhysicalLayout.sourceTag(d, "documents")
        val path = s"/tmp/graft_p03/docs_by_lang_$tag"
        PhysicalLayout.ensureDir(path)(p =>
          t(s, d, "documents").write.partitionBy("lang").mode("overwrite").parquet(p))
        s.read.parquet(path)
          .select(col("n_chars"),
            regexp_extract(col("_metadata.file_path"), "lang=([^/]+)/", 1)
              .as("lang_part"))
          .groupBy("lang_part")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .orderBy("lang_part")
      },
      Some("""SELECT lang AS lang_part, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang_part""".stripMargin))
  )
}
