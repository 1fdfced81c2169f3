package graft.plans

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  test("handcrafted semantics: latest strictly-prior match per key, nulls when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l1"), // no click before -> null
      (1L, 200L, "l2"), // click@150 matches
      (1L, 300L, "l3"), // click@250 beats click@150
      (2L, 200L, "l4"), // other key isolated: click@150 of key 1 must not leak
      (3L, 100L, "l5")  // equal timestamp (100) is NOT "before" -> null
    ).toDF("k", "t", "ltag")
    val right = Seq(
      (1L, 150L, "r150"), (1L, 250L, "r250"), (1L, 400L, "rLate"),
      (3L, 100L, "rEq")
    ).toDF("rk", "rt", "rtag")
    val out = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
      .select("ltag", "rtag").as[(String, String)].collect().toMap
    assert(out("l1") == null)
    assert(out("l2") == "r150")
    assert(out("l3") == "r250")
    assert(out("l4") == null)
    assert(out("l5") == null)
  }

  test("matches the window-over-union formulation on events (r33 semantics)") {
    import spark.implicits._
    val ev = Tables.load(spark, sf, "events")
    // window formulation (strict-time variant: clicks at an earlier ts only)
    val e = ev.filter(col("event_type").isin("click", "purchase"))
      .select("user_id", "event_id", "ts", "event_type")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val viaWindow = e.withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "last_click_ts")
    // native operator
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val viaNative = AsOf.asofJoin(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
      .select(col("user_id"), col("event_id"), col("c_ts").as("last_click_ts"))
    assert(viaNative.count() == viaWindow.count())
    assert(viaNative.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaNative).isEmpty)
  }

  test("plan: AsOfJoinExec with clustered exchanges and sorts inserted") {
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id", "event_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val out = AsOf.asofJoin(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort ["), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("null keys and times match nothing and never crash") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(100L), "ok"),
      (Option.empty[Long], Option(100L), "null_key"),
      (Option(1L), Option.empty[Long], "null_time")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option(50L), "match"),
      (Option.empty[Long], Option(10L), "null_rkey"),
      (Option(1L), Option.empty[Long], "null_rtime")
    ).toDF("rk", "rt", "rtag")
    val out = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
      .select("tag", "rtag").as[(String, String)].collect().toMap
    assert(out("ok") == "match")
    assert(out("null_key") == null)
    assert(out("null_time") == null)
  }

  test("works on empty right side (all nulls)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long)].toDF("rk", "rt")
    val out = AsOf.asofJoin(left, right, "k", "t", "rk", "rt").collect()
    assert(out.length == 1 && out(0).isNullAt(2))
  }
}
