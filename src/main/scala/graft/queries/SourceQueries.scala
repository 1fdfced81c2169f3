package graft.queries

import org.apache.spark.sql.functions._

/** Source/sink format breadth as oracle-checked queries (SURVEY.md §2.B
  * scans row): each query round-trips a fixture table through a non-parquet
  * format (CSV, JSON lines) with an explicit schema, then aggregates — the
  * oracle runs the same aggregate over the original parquet, so a value
  * corrupted anywhere in write→read would hash-mismatch.
  *
  * Scale note: both formats write one file per partition and read back
  * splittable (JSON lines; CSV without multiline), so the round-trip
  * parallelizes on both sides.
  */
object SourceQueries extends QuerySet {

  /** Per-JVM scratch root (unique — concurrent Verify/Bench processes
    * can't clobber each other), deleted on exit so repeated runs don't
    * accumulate table copies. Within one JVM, reruns overwrite in place.
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_roundtrip")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }

  private def tempDir(name: String): String = s"$scratchRoot/$name"

  def queries: Seq[Q] = Seq(

    Q("c01_csv_roundtrip",
      (s, d) => {
        val tmp = tempDir("c01_csv")
        val cust = t(s, d, "customer")
        cust.write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.option("header", "true").schema(cust.schema).csv(tmp)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        | round(sum(c_acctbal), 2) AS total_bal
        |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)),

    Q("c02_json_roundtrip",
      (s, d) => {
        val tmp = tempDir("c02_json")
        val ord = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        ord.write.mode("overwrite").json(tmp)
        s.read.schema(ord.schema).json(tmp)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"),
            max("od").as("last_date"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        | round(sum(o_totalprice), 2) AS total,
        | max(strftime(o_orderdate, '%Y-%m-%d')) AS last_date
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    Q("c03_orc_roundtrip",
      (s, d) => {
        val tmp = tempDir("c03_orc")
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        li.write.mode("overwrite").orc(tmp)
        s.read.schema(li.schema).orc(tmp)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Spark 4 native XML source (one row element per record).
    Q("c04_xml_roundtrip",
      (s, d) => {
        val tmp = tempDir("c04_xml")
        val nat = t(s, d, "nation")
        nat.write.mode("overwrite").option("rowTag", "nation").xml(tmp)
        s.read.option("rowTag", "nation").schema(nat.schema).xml(tmp)
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n"),
            concat_ws(",", array_sort(collect_list("n_name"))).as("names"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
        | string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY 1 ORDER BY n_regionkey""".stripMargin)),

    // Line-oriented text source (spark.read.text — the rawest ingest format
    // a corpus arrives in). One normalized document per line (normalization
    // strips the newlines that would split records); read-back order is
    // partition-dependent, so the aggregate is order-insensitive: per-line
    // md5 XOR-folded via bit_xor + exact count + total chars. The oracle
    // computes the same fold from the parquet directly — any line lost,
    // duplicated, or corrupted in write→read flips the fold.
    Q("c05_text_roundtrip",
      (s, d) => {
        val tmp = tempDir("c05_text")
        val lines = t(s, d, "documents").select(normCol.as("value"))
        lines.write.mode("overwrite").text(tmp)
        s.read.text(tmp)
          .agg(count(lit(1)).as("n_lines"),
            bit_xor(conv(substring(md5(col("value")), 1, 15), 16, 10).cast("long"))
              .as("content_fold"),
            sum(length(col("value"))).as("total_chars"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
        | bit_xor(CAST(('0x' || substring(md5($normSql), 1, 15)) AS BIGINT)) AS content_fold,
        | CAST(sum(length($normSql)) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin))
  )
}
