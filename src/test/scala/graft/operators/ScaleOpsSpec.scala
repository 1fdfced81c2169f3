package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkTestBase {

  test("salted join returns exactly the plain equi-join result") {
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    val plain = li.join(o, Seq("l_orderkey")).select("l_orderkey", "l_linenumber", "o_totalprice")
    val salted = ScaleOps.saltedJoin(li, o, "l_orderkey",
        saltBuckets = 4, saltSource = col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one pathological key with 1000 rows
    val big = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val small = Seq((42L, "dim")).toDF("k", "dim_val")
    val salted = big.withColumn("__salt", pmod(hash(col("payload")), lit(8)))
    val saltCards = salted.select("__salt").distinct().count()
    assert(saltCards > 4, s"salt should spread the hot key, got $saltCards buckets")
    val joined = ScaleOps.saltedJoin(big, small, "k", 8, col("payload"))
    assert(joined.count() == 1000)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("co-partitioned frame reuses its partitioning across aggregations") {
    val li = ScaleOps.coPartition(Tables.load(spark, sf, "lineitem"), "l_orderkey", 4)
    val agg = li.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    agg.collect()
    // AQE toString appends the pre-adaptive "Initial Plan" section — count
    // exchanges only in the final plan
    val plan = agg.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // the groupBy must reuse the repartition exchange, not add a second one
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }
}
