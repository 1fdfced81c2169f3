package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The standard relational surface (SURVEY.md §2.B): scans, filter/project,
  * every join type, aggregation (incl. cube/rollup/grouping sets), window
  * functions, sort/limit/top-k, set ops, and the scalar-function families —
  * all Spark built-ins over the TPC-H-ish fixtures, each with a DuckDB oracle.
  *
  * Scale notes: joins to `nation`/`region`/`customer`/`part`/`supplier` use
  * `broadcast()` (dimension tables stay small relative to the fact tables at
  * any SF); fact-fact joins shuffle on their equi-keys where AQE handles
  * runtime sizing. Window queries partition by high-cardinality keys, so
  * per-partition state stays bounded.
  */
object RelationalQueries extends QuerySet {

  private def sql(tables: Seq[String], q: String): (SparkSession, String) => DataFrame =
    (s, d) => { tables.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(n)); s.sql(q) }

  private val cutoff = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")

  def queries: Seq[Q] = Seq(

    // ---- aggregation over a pushed-down scan (TPC-H Q1 shape) ----
    Q("r01_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- predicate language: IN / LIKE / BETWEEN / <> ----
    Q("r02_filter_predicates",
      (s, d) => t(s, d, "part")
        .filter(col("p_size").isin(1, 5, 10, 15, 20) &&
          col("p_type").like("%O%") &&
          col("p_retailprice").between(500, 1500) &&
          col("p_brand") =!= "Brand#1")
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_size IN (1,5,10,15,20) AND p_type LIKE '%O%'
        |  AND p_retailprice BETWEEN 500 AND 1500 AND p_brand <> 'Brand#1'
        |ORDER BY p_partkey""".stripMargin)),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape); dim side broadcast ----
    Q("r03_top_revenue_orders",
      (s, d) => {
        val c = broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(o("o_orderkey"), date_format(o("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(desc("revenue"), col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin)),

    // ---- left outer join preserving zero-order customers ----
    Q("r04_join_left",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"), c("c_name"))
          .agg(count(o("o_orderkey")).as("n_orders"),
            round(coalesce(sum(o("o_totalprice")), lit(0.0)), 2).as("total_spent"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c.c_custkey, c.c_name, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
        | round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin)),

    // ---- right outer join preserving never-ordered parts ----
    Q("r05_join_right",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val p = t(s, d, "part")
        l.join(p, l("l_partkey") === p("p_partkey"), "right")
          .groupBy(p("p_partkey"))
          .agg(count(l("l_orderkey")).as("n_lineitems"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p.p_partkey, CAST(count(l.l_orderkey) AS BIGINT) AS n_lineitems
        |FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_partkey ORDER BY p.p_partkey""".stripMargin)),

    // ---- full outer join over two aggregated sides ----
    Q("r06_join_full",
      (s, d) => {
        val cn = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sn = t(s, d, "supplier").groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        cn.join(sn, Seq("nk"), "full")
          .select(col("nk").as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""WITH cn AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1),
        |     sn AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(cn.nk, sn.nk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk ORDER BY nationkey""".stripMargin)),

    // ---- left-semi join (EXISTS) ----
    Q("r07_join_semi",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)),

    // ---- left-anti join (NOT EXISTS): orders with no lineitems ----
    Q("r08_join_anti",
      (s, d) => {
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
          .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- cross join (small × small) ----
    Q("r09_join_cross",
      (s, d) => {
        val r = t(s, d, "region").select("r_name")
        val st = t(s, d, "orders").select(col("o_orderstatus")).distinct()
        r.crossJoin(st).orderBy("r_name", "o_orderstatus")
      },
      Some("""SELECT r.r_name, s.o_orderstatus
        |FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        |ORDER BY r.r_name, s.o_orderstatus""".stripMargin)),

    // ---- 5-way star join, dims broadcast ----
    Q("r10_star_join",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = broadcast(t(s, d, "customer"))
        val n = broadcast(t(s, d, "nation"))
        val r = broadcast(t(s, d, "region"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_rows"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r.r_name, n.n_name,
        | round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin)),

    // ---- global aggregate stats incl. variance family ----
    Q("r11_agg_stats",
      (s, d) => t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        countDistinct("l_orderkey").as("n_orders"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        avg("l_quantity").as("avg_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        // rounding grids sized to value magnitude: stddev ~3e4 -> 2dp,
        // variance ~9e8 -> whole units (4dp left only ~100 ulps of margin
        // against cross-engine accumulation-order drift)
        round(stddev("l_extendedprice"), 2).as("sd_price"),
        round(var_samp("l_extendedprice"), 0).as("var_price")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | avg(l_quantity) AS avg_qty, round(sum(l_extendedprice), 2) AS sum_price,
        | round(stddev_samp(l_extendedprice), 2) AS sd_price,
        | round(var_samp(l_extendedprice), 0) AS var_price
        |FROM lineitem""".stripMargin)),

    // ---- group by + having ----
    Q("r12_groupby_having",
      (s, d) => t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin)),

    // ---- rollup ----
    Q("r13_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin)),

    // ---- cube ----
    Q("r14_cube",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin)),

    // ---- grouping sets (SQL surface) ----
    Q("r15_grouping_sets",
      sql(Seq("lineitem"),
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          | coalesce(l_linestatus, 'ALL') AS linestatus,
          | round(sum(l_extendedprice), 2) AS sum_price
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY returnflag, linestatus""".stripMargin),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)),

    // ---- window: row_number / rank / dense_rank, per-group top-k ----
    Q("r16_window_rank",
      (s, d) => {
        val wSeq = Window.partitionBy("l_suppkey")
          .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wTies = Window.partitionBy("l_suppkey").orderBy(desc("l_extendedprice"))
        t(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
            row_number().over(wSeq).as("rn"),
            rank().over(wTies).as("rk"),
            dense_rank().over(wTies).as("drk"))
          .filter(col("rn") <= 3)
          .orderBy("l_suppkey", "rn")
      },
      Some("""SELECT * FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
        |  rank() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC) AS rk,
        |  dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC) AS drk
        | FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin)),

    // ---- window: lag / lead ----
    Q("r17_window_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        | lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        | lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- window: running total ----
    Q("r18_window_running",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum("o_totalprice").over(w), 2).as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- window: ntile quartiles summarized ----
    Q("r19_window_ntile",
      (s, d) => {
        val w = Window.orderBy("o_totalprice", "o_orderkey")
        t(s, d, "orders")
          .select(col("o_totalprice"), ntile(8).over(w).as("tile"))
          .groupBy("tile")
          .agg(count(lit(1)).as("n"), min("o_totalprice").as("min_p"), max("o_totalprice").as("max_p"))
          .orderBy("tile")
      },
      Some("""SELECT tile, CAST(count(*) AS BIGINT) AS n,
        | min(o_totalprice) AS min_p, max(o_totalprice) AS max_p
        |FROM (SELECT o_totalprice, ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS tile FROM orders)
        |GROUP BY tile ORDER BY tile""".stripMargin)),

    // ---- global top-k ----
    Q("r20_topk_global",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(25),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    // ---- union all ----
    Q("r21_union_all",
      (s, d) => {
        val c = t(s, d, "customer").select(lit("cust").as("side"), col("c_nationkey").as("nk"))
        val sp = t(s, d, "supplier").select(lit("supp").as("side"), col("s_nationkey").as("nk"))
        c.unionByName(sp).groupBy("side", "nk").agg(count(lit(1)).as("n"))
          .orderBy("side", "nk")
      },
      Some("""SELECT side, nk, CAST(count(*) AS BIGINT) AS n FROM (
        | SELECT 'cust' AS side, c_nationkey AS nk FROM customer
        | UNION ALL
        | SELECT 'supp' AS side, s_nationkey AS nk FROM supplier)
        |GROUP BY side, nk ORDER BY side, nk""".stripMargin)),

    // ---- intersect (set semantics) ----
    Q("r22_intersect",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin)),

    // ---- except (set semantics) ----
    Q("r23_except",
      (s, d) => t(s, d, "orders").select(col("o_orderkey").as("k"))
        .except(t(s, d, "lineitem").select(col("l_orderkey").as("k")))
        .orderBy("k"),
      Some("""SELECT o_orderkey AS k FROM orders
        |EXCEPT SELECT l_orderkey AS k FROM lineitem ORDER BY k""".stripMargin)),

    // ---- string function family ----
    Q("r24_string_functions",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          lower(col("p_name")).as("lname"),
          upper(col("p_brand")).as("ubrand"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
          regexp_replace(col("p_name"), " ", "_").as("undersc"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
        | substring(p_name, 1, 8) AS prefix, CAST(length(p_name) AS INT) AS name_len,
        | concat_ws('|', p_brand, p_type) AS bt,
        | regexp_replace(p_name, ' ', '_', 'g') AS undersc
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- date function family: monthly order rollup ----
    Q("r25_date_functions",
      (s, d) => t(s, d, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("month"),
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin)),

    // ---- date extraction + arithmetic, row level ----
    Q("r26_date_extract",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dy"),
          quarter(col("o_orderdate")).as("q"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAY"), "yyyy-MM-dd").as("due_date"),
          datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate")).as("days_to_2002"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        | CAST(day(o_orderdate) AS INT) AS dy, CAST(quarter(o_orderdate) AS INT) AS q,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        | CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)),

    // ---- conditional aggregation (CASE WHEN) ----
    Q("r27_conditional_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(0.0)), 2).as("disc_price"),
          sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("n_bulk"),
          count(when(col("l_tax") > 0.04, lit(1))).as("n_taxy"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        | round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS disc_price,
        | CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
        | CAST(count(CASE WHEN l_tax > 0.04 THEN 1 END) AS BIGINT) AS n_taxy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- math function family ----
    Q("r28_math_functions",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("r1"),
          floor(col("l_discount") * 100).as("fl"),
          ceil(col("l_tax") * 100).as("ce"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          abs(col("l_quantity") - 25).as("ab"),
          (col("l_quantity").cast("int") % 7).as("md"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(pow(col("l_quantity"), 2), 6).as("pw"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice, 1) AS r1,
        | CAST(floor(l_discount * 100) AS BIGINT) AS fl,
        | CAST(ceil(l_tax * 100) AS BIGINT) AS ce,
        | round(sqrt(l_quantity), 6) AS sq,
        | abs(l_quantity - 25) AS ab,
        | CAST(l_quantity AS INT) % 7 AS md,
        | round(ln(l_extendedprice), 6) AS lg,
        | round(pow(l_quantity, 2), 6) AS pw
        |FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- scalar subquery ----
    Q("r29_scalar_subquery",
      sql(Seq("orders"),
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- correlated subquery ----
    Q("r30_correlated_subquery",
      sql(Seq("customer", "orders"),
        """SELECT c.c_custkey, CAST(count(*) AS BIGINT) AS n_above_avg
          |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
          |WHERE o.o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
          |                        WHERE o2.o_custkey = c.c_custkey)
          |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin),
      Some("""SELECT c.c_custkey, CAST(count(*) AS BIGINT) AS n_above_avg
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
        |                        WHERE o2.o_custkey = c.c_custkey)
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin)),

    // ---- JSON extraction (A13 metadata analog) ----
    Q("r31_json_extract",
      (s, d) => t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // ---- distinct projection ----
    Q("r32_distinct",
      (s, d) => t(s, d, "orders").select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ---- as-of join: last click before each purchase, per user ----
    Q("r33_asof_last_click",
      (s, d) => {
        val e = t(s, d, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select("user_id", "event_id", "ts", "event_type")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("last_click_ts",
            last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts", "last_click_ts")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |m AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM e)
        |SELECT user_id, event_id, ts, last_click_ts FROM m
        |WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin)),

    // ---- range (interval) join ----
    Q("r34_range_join",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id").as("e_user"), col("event_id").as("e_event"), col("ts").as("e_ts"))
        val signups = t(s, d, "events").filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
        signups.join(ev,
            col("e_user") === col("s_user") &&
            col("e_ts") > col("s_ts") &&
            col("e_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), "left")
          .groupBy(col("s_user").as("user_id"), col("signup_id"))
          .agg(count(col("e_event")).as("n_following"))
          .orderBy("user_id", "signup_id")
      },
      Some("""SELECT s.user_id, s.event_id AS signup_id, CAST(count(e.event_id) AS BIGINT) AS n_following
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
        |LEFT JOIN events e ON e.user_id = s.user_id
        |  AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
        |GROUP BY s.user_id, s.event_id ORDER BY s.user_id, signup_id""".stripMargin)),

    // ---- except all (multiset semantics) ----
    Q("r35_except_all",
      (s, d) => t(s, d, "lineitem").select(col("l_orderkey").as("k"))
        .exceptAll(t(s, d, "orders").select(col("o_orderkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
        | SELECT l_orderkey AS k FROM lineitem
        | EXCEPT ALL
        | SELECT o_orderkey AS k FROM orders)
        |GROUP BY k ORDER BY k""".stripMargin)),

    // ---- from_json to typed struct (A13 metadata parse) ----
    Q("r36_from_json",
      (s, d) => t(s, d, "events")
        .filter(col("event_type") === "view")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE event_type = 'view' ORDER BY event_id""".stripMargin)),

    // ---- native as-of join (custom LogicalPlan + Strategy + SparkPlan):
    // strictly-before backward join, O(1) merge state per partition ----
    Q("r37_asof_native",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        graft.plans.AsOf.asofJoin(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
          .select(col("user_id"), col("event_id"), col("ts"), col("c_ts").as("last_click_ts"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.event_id, p.ts,
        |  (SELECT max(c.ts) FROM c WHERE c.user_id = p.user_id AND c.ts < p.ts) AS last_click_ts
        |FROM p ORDER BY p.user_id, p.event_id""".stripMargin)),

    // ---- exact percentiles (interpolated) + median ----
    Q("r38_percentiles",
      (s, d) => {
        // ORDER-STATISTICS exact percentiles (OrderStats, round 18): the
        // `percentile` aggregate built boxed value→count maps per partial
        // and merged them in one final task per group (gc_ms 343 on 600k
        // rows); the window form sorts primitives once per column and
        // aggregates only the ~2 ranked rows each point touches. Results
        // are BIT-identical (OrderStatsSpec pins the interpolation against
        // the aggregate); the oracle is unchanged.
        val li = t(s, d, "lineitem")
        val ep = graft.operators.OrderStats.exactPercentilesByGroup(
          li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9, 0.99), "ps")
        val mq = graft.operators.OrderStats.exactPercentileByGroup(
          li, "l_returnflag", "l_quantity", 0.5, "med")
        ep.join(mq, "l_returnflag")
          .select(col("l_returnflag"),
            round(col("ps_0"), 4).as("p50"),
            round(col("ps_1"), 4).as("p90"),
            round(col("ps_2"), 4).as("p99"),
            round(col("med"), 4).as("med_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        | round(median(l_quantity), 4) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- null-safe equality (<=> / IS NOT DISTINCT FROM) over outer-join nulls ----
    Q("r39_nullsafe_eq",
      (s, d) => {
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(max("l_linenumber").as("max_line"))
        // left join -> null max_line for lineitem-less orders; null-safe
        // compare classifies them deterministically
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
          .select(col("o_orderkey"),
            (col("max_line") <=> lit(null)).as("no_lines"),
            (col("max_line") <=> lit(7)).as("has_seven"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o.o_orderkey,
        | (l.max_line IS NOT DISTINCT FROM NULL) AS no_lines,
        | (l.max_line IS NOT DISTINCT FROM 7) AS has_seven
        |FROM orders o LEFT JOIN (
        |  SELECT l_orderkey, CAST(max(l_linenumber) AS INT) AS max_line
        |  FROM lineitem GROUP BY l_orderkey) l
        |ON o.o_orderkey = l.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin)),

    // ---- window navigation: first/last/nth value, percent_rank, cume_dist ----
    Q("r40_window_navigation",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            first("o_totalprice").over(wFull).as("first_price"),
            last("o_totalprice").over(wFull).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        | first_value(o_totalprice) OVER wf AS first_price,
        | last_value(o_totalprice) OVER wf AS last_price,
        | nth_value(o_totalprice, 2) OVER wf AS second_price,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- extended string functions ----
    Q("r41_string_extra",
      (s, d) => t(s, d, "part")
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "#").as("rp"),
          reverse(col("p_type")).as("rev"),
          repeat(col("p_type"), 2).as("rep"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          substring(col("p_name"), 1, 4).as("lft"),
          ascii(col("p_brand")).as("asc"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).as("brand_num"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        | lpad(p_brand, 12, '*') AS lp,
        | rpad(p_brand, 12, '#') AS rp,
        | reverse(p_type) AS rev,
        | repeat(p_type, 2) AS rep,
        | translate(p_name, 'aeiou', 'AEIOU') AS tr,
        | substring(p_name, 1, 4) AS lft,
        | CAST(ascii(p_brand) AS INT) AS asc,
        | regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin)),

    // ---- array functions over deterministic collect_list ----
    Q("r42_array_functions",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
        .select(col("l_orderkey"),
          // arrays serialized to strings so the oracle compare is
          // representation-independent
          concat_ws(",", col("lines")).as("lines_str"),
          size(col("lines")).as("n"),
          array_contains(col("lines"), 3).as("has3"),
          element_at(col("lines"), 1).as("first_line"),
          concat_ws(",", slice(col("lines"), 1, 2)).as("first_two"),
          concat_ws(",", array_distinct(col("lines"))).as("dist"),
          concat_ws(",", reverse(col("lines"))).as("rev"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
        | array_to_string(lines, ',') AS lines_str,
        | CAST(len(lines) AS INT) AS n,
        | list_contains(lines, 3) AS has3,
        | lines[1] AS first_line,
        | array_to_string(lines[1:2], ',') AS first_two,
        | array_to_string(list_sort(list_distinct(lines)), ',') AS dist,
        | array_to_string(list_reverse(lines), ',') AS rev
        |FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
        |      FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
        |ORDER BY l_orderkey""".stripMargin)),

    // ---- higher-order functions (lambdas over arrays) ----
    Q("r43_higher_order",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
        .select(col("l_orderkey"),
          concat_ws(",", transform(col("lines"), x => x * 2)).as("doubled"),
          concat_ws(",", filter(col("lines"), x => x > 2)).as("gt2"),
          exists(col("lines"), x => x === 7).as("has7"),
          aggregate(col("lines"), lit(0), (acc, x) => acc + x).as("line_sum"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
        | array_to_string(list_transform(lines, x -> x * 2), ',') AS doubled,
        | coalesce(array_to_string(list_filter(lines, x -> x > 2), ','), '') AS gt2,
        | CAST(len(list_filter(lines, x -> x = 7)) > 0 AS BOOLEAN) AS has7,
        | CAST(list_aggregate(lines, 'sum') AS INT) AS line_sum
        |FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
        |      FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
        |ORDER BY l_orderkey""".stripMargin)),

    // ---- pivot (wide conditional aggregation) ----
    Q("r44_pivot",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- map functions ----
    Q("r45_map_functions",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          map_from_arrays(array(lit("status"), lit("priority")),
            array(col("o_orderstatus"), col("o_orderpriority"))).as("m"))
        .select(col("o_orderkey"),
          element_at(col("m"), "status").as("status"),
          element_at(col("m"), "priority").as("priority"),
          concat_ws(",", map_keys(col("m"))).as("keys"),
          size(col("m")).as("n_entries"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        | m['status'][1] AS status,
        | m['priority'][1] AS priority,
        | array_to_string(map_keys(m), ',') AS keys,
        | CAST(cardinality(m) AS INT) AS n_entries
        |FROM (SELECT o_orderkey,
        |        map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
        |      FROM orders WHERE o_orderkey <= 300)
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- EXISTS / NOT EXISTS correlated predicates ----
    Q("r46_exists_subquery",
      sql(Seq("customer", "orders"),
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)),

    // ---- lateral join (correlated derived table, per-row top-2) ----
    Q("r47_lateral_join",
      sql(Seq("customer", "orders"),
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer c JOIN LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey <= 100
          |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin),
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)),

    // ---- unpivot (wide → long via stack Generator) ----
    Q("r48_unpivot",
      sql(Seq("lineitem"),
        """SELECT l_orderkey, l_linenumber, metric, val FROM (
          |  SELECT l_orderkey, l_linenumber,
          |    stack(4, 'discount', CAST(l_discount AS DOUBLE),
          |             'price', CAST(l_extendedprice AS DOUBLE),
          |             'quantity', CAST(l_quantity AS DOUBLE),
          |             'tax', CAST(l_tax AS DOUBLE)) AS (metric, val)
          |  FROM lineitem WHERE l_orderkey <= 50)
          |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin),
      Some("""WITH base AS (SELECT * FROM lineitem WHERE l_orderkey <= 50)
        |SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'discount' AS metric, CAST(l_discount AS DOUBLE) AS val FROM base
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', CAST(l_extendedprice AS DOUBLE) FROM base
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'quantity', CAST(l_quantity AS DOUBLE) FROM base
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax', CAST(l_tax AS DOUBLE) FROM base)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // ---- sequence generation (1 row → N rows, bounded per row) ----
    Q("r49_sequence_explode",
      sql(Seq("region"),
        """SELECT r_regionkey, CAST(x AS BIGINT) AS x
          |FROM region LATERAL VIEW explode(sequence(1, r_regionkey + 2)) t AS x
          |ORDER BY r_regionkey, x""".stripMargin),
      Some("""SELECT r_regionkey, CAST(unnest(generate_series(1, r_regionkey + 2)) AS BIGINT) AS x
        |FROM region ORDER BY r_regionkey, x""".stripMargin)),

    // ---- struct (nested record) construction + field access ----
    Q("r50_struct_ops",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          struct(col("o_orderstatus").as("status"), col("o_totalprice").as("price")).as("rec"))
        .select(col("o_orderkey"),
          col("rec.status").as("status"),
          round(col("rec.price") * 1.1, 2).as("price_with_fee"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, rec.status AS status,
        | round(rec.price * 1.1, 2) AS price_with_fee
        |FROM (SELECT o_orderkey,
        |        struct_pack(status := o_orderstatus, price := o_totalprice) AS rec
        |      FROM orders WHERE o_orderkey <= 200)
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- ordered string aggregation (listagg) ----
    Q("r51_string_agg",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 500)
        .groupBy("o_custkey")
        .agg(concat_ws(",",
          array_sort(collect_list(col("o_orderkey").cast("string")))).as("order_keys"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
        | string_agg(CAST(o_orderkey AS VARCHAR), ','
        |   ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys,
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders WHERE o_orderkey <= 500
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ---- bitwise operators ----
    Q("r52_bitwise",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(255).as("band"),
          col("o_orderkey").bitwiseOR(16).as("bor"),
          col("o_orderkey").bitwiseXOR(85).as("bxor"),
          shiftleft(col("o_orderkey").bitwiseAND(15), 2).as("shifted"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        | o_orderkey & 255 AS band,
        | o_orderkey | 16 AS bor,
        | xor(o_orderkey, 85) AS bxor,
        | (o_orderkey & 15) << 2 AS shifted
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin)),

    // ---- regexp capture groups ----
    Q("r53_regexp_groups",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "(Customer)#(\\d+)", 1).as("prefix"),
          regexp_extract(col("c_name"), "(Customer)#(\\d+)", 2).cast("long").as("num"),
          regexp_replace(col("c_name"), "0+(\\d)", "$1").as("compact"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        | regexp_extract(c_name, '(Customer)#(\d+)', 1) AS prefix,
        | CAST(regexp_extract(c_name, '(Customer)#(\d+)', 2) AS BIGINT) AS num,
        | regexp_replace(c_name, '0+(\d)', '\1', 'g') AS compact
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin)),

    // ---- date/interval arithmetic ----
    Q("r54_interval_arith",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("due_date"),
          date_format(add_months(col("o_orderdate").cast("date"), 3), "yyyy-MM-dd").as("quarter_later"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_eoy"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("order_month"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        | strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        | strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS quarter_later,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin)),

    // ---- exact decimal aggregation (no float drift) ----
    Q("r55_decimal_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("dec_sum"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("dec_sum").cast("string").as("total_price"), col("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS total_price,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- gap-based sessionization (batch) ----
    Q("r56_sessionization",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("gap_s",
            unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)))
          .withColumn("new_session",
            when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("new_session").as("n_sessions"))
          .orderBy("user_id")
      },
      // floor(epoch()) on both lag terms: DuckDB epoch() is fractional,
      // Spark unix_timestamp truncates — gaps within 1s of the 1800s
      // threshold would otherwise split sessions differently (same class
      // of mismatch r59 floors away)
      Some("""WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- latest-record-per-key compaction (SCD/upsert semantics) ----
    Q("r57_latest_per_key",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type, ts FROM (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- salted two-phase aggregation (skew mitigation), proven against
    // the plain single-phase oracle: partial sums on (key, salt), then a
    // final merge on key — same result, but the first exchange spreads a
    // hot key over `salt` reducers ----
    Q("r58_salted_agg",
      (s, d) => {
        val salted = t(s, d, "lineitem")
          .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
          .groupBy("l_returnflag", "salt")
          .agg(sum("l_quantity").as("part_qty"), count(lit(1)).as("part_n"))
        salted.groupBy("l_returnflag")
          .agg(round(sum("part_qty"), 2).as("sum_qty"), sum("part_n").as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- RANGE window frame (value-based, not row-based): per-user count
    // and sum of events in the trailing hour, inclusive of current ----
    Q("r59_range_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("es"))
          .rangeBetween(-3600, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("es"), col("value"))
          .withColumn("n_last_hour", count(lit(1)).over(w))
          .withColumn("sum_last_hour", round(sum("value").over(w), 2))
          .select("user_id", "event_id", "n_last_hour", "sum_last_hour")
          .orderBy("user_id", "event_id")
      },
      // oracle floors epoch() to whole seconds: DuckDB's epoch() is
      // fractional while Spark's unix_timestamp truncates — frames must be
      // computed over the same integer axis
      Some("""WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es, value
        |  FROM events)
        |SELECT user_id, event_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
        | round(sum(value) OVER w, 2) AS sum_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- arg-max / arg-min aggregation. The tie-breaker is a composite
    // string key (zero-padded shifted balance + name) because the two
    // engines' arg_max accept different tuple types but order identical
    // strings identically ----
    Q("r60_argmax",
      (s, d) => {
        val key = concat(format_string("%012.2f", col("c_acctbal") + 10000.0),
          lit("|"), col("c_name"))
        t(s, d, "customer")
          .groupBy("c_mktsegment")
          .agg(
            max_by(col("c_name"), key).as("richest"),
            min_by(col("c_name"), key).as("poorest"),
            round(max("c_acctbal"), 2).as("max_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
        | arg_max(c_name, printf('%012.2f', c_acctbal + 10000.0) || '|' || c_name) AS richest,
        | arg_min(c_name, printf('%012.2f', c_acctbal + 10000.0) || '|' || c_name) AS poorest,
        | round(max(c_acctbal), 2) AS max_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- time-spine gap filling: dense hourly series per event_type with
    // zeros for empty hours (the resample/asfreq operation). The spine is
    // generated per group from its own min/max — no driver-side ranges ----
    Q("r61_gap_fill",
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
        val spine = e.groupBy("event_type")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("event_type"),
            explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
        val hourly = e.groupBy("event_type", "h")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        spine.join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"),
            date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("total"), lit(0.0)).as("total"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH e AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value
        |  FROM events),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        |  FROM e GROUP BY event_type),
        |hourly AS (
        |  SELECT event_type, h, count(*) AS n, round(sum(value), 2) AS total
        |  FROM e GROUP BY event_type, h)
        |SELECT s.event_type, strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
        | CAST(coalesce(n, 0) AS BIGINT) AS n, coalesce(total, 0.0) AS total
        |FROM spine s LEFT JOIN hourly USING (event_type, h)
        |ORDER BY event_type, hour""".stripMargin)),

    // ---- bivariate statistics family ----
    Q("r62_stats_family",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qp"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- SQL-defined UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    // declarative, catalog-managed, fully optimizable — unlike JVM UDFs the
    // body inlines into the plan and stays inside codegen ----
    Q("r63_sql_udf",
      (s, d) => {
        Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION net_price(price DOUBLE, disc DOUBLE, tax DOUBLE)
                |RETURNS DOUBLE RETURN price * (1 - disc) * (1 + tax)""".stripMargin)
        s.sql("""SELECT l_returnflag, round(sum(net_price(l_extendedprice, l_discount, l_tax)), 2) AS net
                |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS net
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- VARIANT semi-structured type (Spark 4): parse once, extract with
    // type coercion — the open-schema path for the props blob ----
    Q("r64_variant",
      (s, d) => {
        Tables.load(s, d, "events").createOrReplaceTempView("events")
        s.sql("""SELECT event_id, variant_get(parse_json(props), '$.k', 'int') AS k
                |FROM events WHERE event_type = 'purchase'
                |ORDER BY event_id""".stripMargin)
      },
      Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin)),

    // ---- collated string comparison (Spark 4): case-insensitive equality
    // via UTF8_LCASE collation instead of lower() rewrites ----
    Q("r65_collation",
      (s, d) => {
        Tables.load(s, d, "part").createOrReplaceTempView("part")
        s.sql("""SELECT count(*) AS n_matches
                |FROM part
                |WHERE collate(p_type, 'UTF8_LCASE') = collate('economy', 'UTF8_LCASE')""".stripMargin)
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_matches
        |FROM part WHERE lower(p_type) = 'economy'""".stripMargin)),

    // ---- explicit null ordering. Spark sorts nulls FIRST ascending by
    // default, DuckDB LAST — any query exposing nulls in a sort key must
    // pin NULLS FIRST/LAST explicitly or the engines disagree ----
    Q("r66_null_ordering",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          // derive nulls deterministically: P-status rows get null price
          when(col("o_orderstatus") === "P", lit(null).cast("double"))
            .otherwise(col("o_totalprice")).as("price_or_null"))
        // LIMIT makes the ordering observable to the hash compare (the
        // comparator re-sorts unlimited outputs)
        .orderBy(col("price_or_null").desc_nulls_last, col("o_orderkey"))
        .limit(5)
        .select(col("o_orderkey"),
          coalesce(col("price_or_null"), lit(-1.0)).as("price_display")),
      Some("""SELECT o_orderkey, coalesce(price_or_null, -1.0) AS price_display
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null
        |      FROM orders WHERE o_orderkey <= 200)
        |ORDER BY price_or_null DESC NULLS LAST, o_orderkey LIMIT 5""".stripMargin)),

    // ---- sequenced conversion funnel: signup → later view → later
    // purchase, strictly ordered per user (each stage joins on the
    // previous stage's first-completion time) ----
    Q("r67_event_funnel",
      (s, d) => {
        val ev = t(s, d, "events").select("user_id", "event_type", "ts")
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("t0"))
        val vw = ev.filter(col("event_type") === "view").as("e")
          .join(su, Seq("user_id"))
          .filter(col("ts") > col("t0"))
          .groupBy("user_id").agg(min("ts").as("t1"))
        val pu = ev.filter(col("event_type") === "purchase").as("e")
          .join(vw, Seq("user_id"))
          .filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        su.agg(count(lit(1)).as("n_signup"))
          .crossJoin(vw.agg(count(lit(1)).as("n_viewed")))
          .crossJoin(pu.agg(count(lit(1)).as("n_purchased")))
      },
      Some("""WITH s AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |v AS (
        |  SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
        |  WHERE e.event_type = 'view' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
        |       (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
        |       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased""".stripMargin)),

    // ---- cohort retention: users bucketed by first-seen week, counted in
    // each later activity week. Offsets via epoch arithmetic on the
    // week-truncated timestamps (exact multiples — no week-boundary
    // counting semantics to reconcile between engines) ----
    Q("r68_cohort_retention",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        val first = ev.groupBy("user_id").agg(min("w").as("cohort"))
        ev.distinct().join(first, "user_id")
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
            ((unix_timestamp(col("w")) - unix_timestamp(col("cohort"))) / 604800)
              .cast("int").as("week_offset"))
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH ev AS (
        |  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS w
        |  FROM events),
        |f AS (SELECT user_id, min(w) AS cohort FROM ev GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        | CAST((epoch(w) - epoch(cohort)) / 604800 AS INT) AS week_offset,
        | CAST(count(*) AS BIGINT) AS n_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)),

    // Distribution window functions (percent_rank / cume_dist / nth_value)
    // completing the window family. The (totalprice, orderkey) ordering is
    // total, so the rank fractions are deterministic on both engines;
    // nth_value uses the default running frame (null until the 3rd row of
    // the partition) identically in Spark and DuckDB.
    Q("r69_dist_windows",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders").select(
            col("o_orderkey"), col("o_orderpriority"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            nth_value(col("o_orderkey"), 3).over(w).as("third_cheapest"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd,
        | nth_value(o_orderkey, 3) OVER w AS third_cheapest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)),

    // Recursive CTE (new in Spark 4): data-dependent-depth hierarchy walk —
    // every doc climbs its radix-10 ancestor chain (parent = floor(id/10))
    // until a single-digit root, returning (doc_id, root, depth). The
    // recursion is acyclic with UNION ALL, depth = ceil(log10(max id)); the
    // oracle runs the same recursion in DuckDB.
    Q("r70_recursive_cte",
      (s, d) => {
        t(s, d, "documents").createOrReplaceTempView("documents_r70")
        s.sql("""
          WITH RECURSIVE chain(doc_id, cur, depth) AS (
            SELECT doc_id, doc_id, 0 FROM documents_r70
            UNION ALL
            SELECT doc_id, CAST(floor(cur / 10) AS BIGINT), depth + 1
            FROM chain WHERE cur >= 10)
          SELECT doc_id, cur AS root, CAST(depth AS INT) AS depth
          FROM chain WHERE cur < 10
          ORDER BY doc_id""")
      },
      Some("""WITH RECURSIVE chain(doc_id, cur, depth) AS (
        |  SELECT doc_id, doc_id, 0 FROM documents
        |  UNION ALL
        |  SELECT doc_id, CAST(floor(cur / 10) AS BIGINT), depth + 1
        |  FROM chain WHERE cur >= 10)
        |SELECT doc_id, cur AS root, CAST(depth AS INT) AS depth
        |FROM chain WHERE cur < 10
        |ORDER BY doc_id""".stripMargin)),

    // Approximate percentile sketch graded by tolerance flag, t14-style:
    // percentile_approx (mergeable KLL-ish sketch — the 100 TB path, vs the
    // exact percentile's full per-group sort r38 pays) must land inside the
    // exact [q-0.005, q+0.005] quantile band; the oracle recomputes the
    // exact band and expects every flag = 1 (rank error at accuracy 10000
    // is 1e-4, 50x inside the band).
    Q("r71_approx_percentile",
      (s, d) => {
        // exact side = ORDER-STATISTICS (OrderStats — r38's rework; bit-
        // identical to the old single `percentile` array aggregate, which
        // built boxed value→count maps); sketch side unchanged — the
        // approx_percentile results the band flags grade must stay the
        // declared sketch at accuracy 10000
        val li = t(s, d, "lineitem")
        val ex = graft.operators.OrderStats.exactPercentilesByGroup(
          li, "l_returnflag", "l_extendedprice",
          Seq(0.495, 0.5, 0.505, 0.945, 0.955), "ps")
        val ap = li.groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)")
            .as("ap"))
        ex.join(ap, "l_returnflag")
          .select(col("l_returnflag"),
            round(col("ps_1"), 4).as("exact_p50"),
            col("ap").getItem(0).between(col("ps_0"), col("ps_2"))
              .cast("int").as("p50_in_band"),
            col("ap").getItem(1).between(col("ps_3"), col("ps_4"))
              .cast("int").as("p95_in_band"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        | 1 AS p50_in_band,
        | 1 AS p95_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ANSI error-safe arithmetic (Spark 4 try_* family): divide-by-zero and
    // failed casts yield NULL instead of aborting the job — the semantics a
    // 100 TB batch needs (one malformed row must not kill a 6-hour run).
    // try_divide hits a real zero denominator on every first line item
    // (l_linenumber - 1); try_cast of the flag letters always fails; the
    // oracle mirrors both with explicit NULL cases / TRY_CAST.
    Q("r72_try_arithmetic",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_returnflag"),
          try_divide(col("l_extendedprice"), col("l_linenumber") - 1).as("safe_div"),
          // digit-guarded TRY_CAST: Spark's string→int TRY_CAST pays a
          // thrown-and-caught JVM exception per FAILING row (~9 µs —
          // measured 5.6 s over 600k all-failing rows vs 0.2 s when casts
          // succeed). Any string that casts to INT must contain a digit,
          // so the guard is strictly semantics-preserving (guard false ⇒
          // cast surely null) and converts the 100%-failure worst case
          // into one cheap regex per row. Oracle unchanged.
          when(col("l_returnflag").rlike("[0-9]"),
            expr("TRY_CAST(l_returnflag AS INT)")).as("flag_as_int"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          count(col("safe_div")).as("n_divisible"),
          round(sum("safe_div"), 2).as("sum_safe_div"),
          count(col("flag_as_int")).as("n_cast_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | CAST(count(CASE WHEN l_linenumber <> 1
        |   THEN l_extendedprice / (l_linenumber - 1) END) AS BIGINT) AS n_divisible,
        | round(sum(CASE WHEN l_linenumber <> 1
        |   THEN l_extendedprice / (l_linenumber - 1) END), 2) AS sum_safe_div,
        | CAST(count(TRY_CAST(l_returnflag AS INT)) AS BIGINT) AS n_cast_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // GROUP BY ALL / ORDER BY ALL (modern SQL shorthand both engines
    // support natively — Spark 4 and DuckDB agree on the semantics: group
    // on every non-aggregate select item, order by all output columns
    // left-to-right). Exercised through spark.sql to prove the SQL-surface
    // parity, not a DataFrame translation.
    Q("r73_group_by_all",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("r73_orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
          | count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM r73_orders GROUP BY ALL ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
        | CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // Scale-safe global quantile tiles — the 100 TB companion to r19's
    // exact global ntile (which is inherently a single-partition window).
    // Plan shape: one broadcast single-row aggregate (approx_percentile
    // boundary array + exact count/min/max), one narrow map assigning each
    // row to its tile by counting boundaries below it, one hash
    // aggregation. No window, no global sort of the corpus — every stage
    // is embarrassingly parallel (PlanSpec asserts Window-free).
    //
    // Graded by the r71/t14 tolerance-flag pattern: the oracle states the
    // contract (exact n_total/g_min/g_max; all flags 1) and the engine must
    // meet it — per-tile counts within max(2 % of corpus, 8 rows) of the
    // ideal n/8 (approx_percentile accuracy 10000 → rank error ≤ n/10000,
    // far inside the band), per-tile spans ordered, and the outer tiles
    // pinned to the exact global min/max.
    Q("r74_quantile_tiles_scalable",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_totalprice").as("p"))
        val qs = (1 to 7).map(i => i / 8.0)
        val bounds = broadcast(o.agg(
          expr(s"approx_percentile(p, array(${qs.mkString(", ")}), 10000)").as("bounds"),
          count(lit(1)).as("n_total"),
          min("p").as("g_min"),
          max("p").as("g_max")))
        val tiles = o.crossJoin(bounds)
          .withColumn("tile",
            (expr("aggregate(bounds, 0, (acc, b) -> acc + CASE WHEN p > b THEN 1 ELSE 0 END)")
              + 1).cast("int"))
          .groupBy("tile")
          .agg(count(lit(1)).as("n"),
            min("p").as("min_p"), max("p").as("max_p"))
        // 8-row tile spine: a tile emptied by duplicate approx boundaries
        // (heavy value ties) or by n_total < 8 must surface as a FLAGGED
        // row, not a missing one — a rows_match failure would point at the
        // comparator instead of the distribution. Empty tiles report
        // n_in_band/edges_ok = 0 (contract unmet), span_ok = 1 (vacuous).
        s.range(1, 9).select(col("id").cast("int").as("tile"))
          .crossJoin(bounds)
          .join(broadcast(tiles), Seq("tile"), "left")
          .select(col("tile"), col("n_total"), col("g_min"), col("g_max"),
            (col("n").isNotNull && abs(col("n") - col("n_total") / 8.0) <=
              greatest(col("n_total") / 50.0, lit(8.0))).cast("int").as("n_in_band"),
            coalesce(col("min_p") <= col("max_p"), lit(true)).cast("int").as("span_ok"),
            (when(col("tile") === 1,
                coalesce(col("min_p") === col("g_min"), lit(false))).otherwise(lit(true)) &&
              when(col("tile") === 8,
                coalesce(col("max_p") === col("g_max"), lit(false))).otherwise(lit(true)))
              .cast("int").as("edges_ok"))
          .orderBy("tile")
      },
      Some("""SELECT CAST(i AS INT) AS tile,
        | (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_total,
        | (SELECT min(o_totalprice) FROM orders) AS g_min,
        | (SELECT max(o_totalprice) FROM orders) AS g_max,
        | 1 AS n_in_band, 1 AS span_ok, 1 AS edges_ok
        |FROM range(1, 9) t(i) ORDER BY tile""".stripMargin))
  )
}
