package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Contract of the IVF-cell-blocked semantic dedup (v18):
  * within-cell pairs are a strict subset of the exact pair set, multi-probe
  * assignment only ADDS recovered pairs, the keep-lowest-id drop policy is
  * deterministic and partitions the corpus, and the whole path is a pure
  * function of the persisted assignment.
  */
class SemDedupSpec extends SparkTestBase {

  private val Tau = 0.45

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private lazy val model = IvfIndex.train(spark, emb, k = 8)

  private lazy val assigned = IvfIndex.assign(spark, emb, model).cache()

  /** Exact pair baseline: all-pairs cosine above Tau (small fixture). */
  private lazy val exactPairs = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.expressions.GraftFunctions.cosine_sim(col("ea"), col("eb")))
      .filter(col("sim") > Tau)
      .select("id_a", "id_b").cache()
  }

  test("md5Panel is the SQL-recomputable sample; panelAnchoredPairs == exact pairs restricted to anchors") {
    val p = 16
    val panel = AnnEval.md5Panel(emb, p)
    assert(panel.size == p)
    assert(panel.map(_._1) == panel.map(_._1).sorted)
    // membership equals the md5-ordering definition computed independently
    val expectIds = emb
      .select(col("vec_id"), md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(p)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(panel.map(_._1).toSet == expectIds)
    // anchored pairs are EXACTLY the all-pairs set restricted to pairs
    // with >= 1 panel endpoint (the linear-work path loses nothing)
    val anchored = AnnEval.panelAnchoredPairs(emb, panel, Tau)
    val expected = exactPairs.filter(
      col("id_a").isin(panel.map(_._1): _*) ||
        col("id_b").isin(panel.map(_._1): _*))
    assert(anchored.count() == expected.count())
    assert(anchored.join(expected, Seq("id_a", "id_b"), "left_anti").count() == 0)
    assert(expected.join(anchored, Seq("id_a", "id_b"), "left_anti").count() == 0)
    // panel larger than the corpus degrades to the full corpus (no dupes)
    val all = AnnEval.md5Panel(emb, 1000000)
    assert(all.size == emb.count())
  }

  test("panel survivor containment gate catches a wrong-survivor drop policy") {
    val spark2 = spark
    import spark2.implicits._
    // synthetic corpus with KNOWN structure: ids 0..19 each have an exact
    // clone at 100+i (one-hot vectors — non-clone cosine is exactly 0);
    // ids 20..39 have no partner. Keep-lowest-id must drop {100..119}.
    val data = (0 until 40).flatMap { i =>
      val v = Array.tabulate(40)(j => if (j == i) 1f else 0f).toSeq
      if (i < 20) Seq((i.toLong, 0, v), ((100 + i).toLong, 0, v))
      else Seq((i.toLong, 0, v))
    }
    val emb = data.toDF("vec_id", "label", "embedding")
    val panel = AnnEval.md5Panel(emb, 20)
    val panelIds = panel.map(_._1).toSet
    // the synthetic id layout guarantees the panel straddles both sides
    require(panelIds.exists(_ < 20) && panelIds.exists(_ >= 100),
      s"fixture assumption broke: $panelIds")
    val anchored = AnnEval.panelAnchoredPairs(emb, panel, tau = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // anchored pairs are exactly the clone pairs touching the panel
    assert(anchored.forall { case (a, b) => b == a + 100 })
    val exactDropPanel = anchored.map(_._2).toSet & panelIds
    val exactPanelSurvivors = panelIds -- exactDropPanel
    // CORRECT policy (drop id_b of every pair): containment holds
    val survCorrect = data.map(_._1).toSet -- (100 until 120).map(_.toLong)
    assert((exactPanelSurvivors -- survCorrect).isEmpty)
    // BROKEN policy (drop id_a — keep-HIGHEST-id): drops panel docs that
    // are exact survivors, so the containment gate must fail...
    val survBroken = data.map(_._1).toSet -- (0 until 20).map(_.toLong)
    assert((exactPanelSurvivors -- survBroken).nonEmpty,
      "gate failed to catch the wrong-survivor policy")
    // ...where a COUNT-based gate can be fooled whenever the wrong drops
    // happen to balance out — the reason x14 checks containment
  }

  test("cell pairs are a subset of the exact pair set, with exact sims") {
    val cell = SemDedup.cellPairs(assigned, Tau)
    assert(cell.select("id_a", "id_b")
      .join(exactPairs, Seq("id_a", "id_b"), "left_anti").count() == 0)
    // every emitted sim really is above tau (the filter is on the exact value)
    assert(cell.filter(col("sim") <= Tau).count() == 0)
  }

  test("same-cell exact pairs are ALL recovered (no loss inside a cell)") {
    val cells = assigned.select(col("vec_id"), col("cell"))
    val sameCellExact = exactPairs
      .join(cells.withColumnRenamed("vec_id", "id_a").withColumnRenamed("cell", "ca"), "id_a")
      .join(cells.withColumnRenamed("vec_id", "id_b").withColumnRenamed("cell", "cb"), "id_b")
      .filter(col("ca") === col("cb"))
      .select("id_a", "id_b")
    val cell = SemDedup.cellPairs(assigned, Tau).select("id_a", "id_b")
    assert(sameCellExact.join(cell, Seq("id_a", "id_b"), "left_anti").count() == 0)
  }

  test("multiAssign expands to assignK cells per vector, primary cell included") {
    val expanded = SemDedup.multiAssign(assigned, model, assignK = 3)
    assert(expanded.count() == assigned.count() * 3)
    assert(expanded.groupBy("vec_id").count().filter(col("count") =!= 3).count() == 0)
    // the single-assignment cell is always among the k nearest
    assert(assigned.select("vec_id", "cell")
      .join(expanded.select("vec_id", "cell"), Seq("vec_id", "cell"), "left_anti")
      .count() == 0)
  }

  test("multi-probe pairs ⊇ single-assignment pairs, and still ⊆ exact pairs") {
    val single = SemDedup.cellPairs(assigned, Tau).select("id_a", "id_b")
    val multi = SemDedup.cellPairs(
      SemDedup.multiAssign(assigned, model, assignK = 3), Tau)
    // no duplicate pair rows despite shared-cell copies
    assert(multi.count() == multi.select("id_a", "id_b").distinct().count())
    val multiIds = multi.select("id_a", "id_b")
    assert(single.join(multiIds, Seq("id_a", "id_b"), "left_anti").count() == 0)
    assert(multiIds.join(exactPairs, Seq("id_a", "id_b"), "left_anti").count() == 0)
  }

  test("survivors + dropped partition the corpus; dropped ids each have a lower-id cell neighbor") {
    val pairs = SemDedup.cellPairs(assigned, Tau).cache()
    val dropped = SemDedup.dropped(pairs).cache()
    val survivors = SemDedup.survivors(assigned, pairs)
    assert(dropped.count() + survivors.count() == assigned.count())
    assert(survivors.join(dropped, Seq("vec_id"), "semi").count() == 0)
    // by construction: every dropped id is the higher member of some pair
    val asHigher = pairs.select(col("id_b").as("vec_id")).distinct()
    assert(dropped.join(asHigher, Seq("vec_id"), "left_anti").count() == 0)
  }

  test("deterministic across runs") {
    def run() = SemDedup.dropped(SemDedup.cellPairs(
      SemDedup.multiAssign(assigned, model, assignK = 3), Tau))
      .orderBy("vec_id").collect().toSeq
    assert(run() == run())
  }

  test("cell-pair plan is one equi-join on cell — no nested-loop product") {
    val plan = SemDedup.cellPairs(assigned, Tau).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
