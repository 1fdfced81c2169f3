package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkTestBase {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("training is deterministic") {
    val m1 = IvfIndex.train(spark, emb, k = 8)
    val m2 = IvfIndex.train(spark, emb, k = 8)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("every vector is assigned to exactly one cell") {
    val model = IvfIndex.train(spark, emb, k = 8)
    val assigned = IvfIndex.assign(spark, emb, model)
    assert(assigned.count() == emb.count())
    assert(assigned.filter(col("cell") < 0 || col("cell") >= 8).count() == 0)
    // cells are actually used (not all in one bucket)
    assert(assigned.select("cell").distinct().count() > 1)
  }

  test("probing all cells reproduces the exact brute-force top-k") {
    import spark.implicits._
    val model = IvfIndex.train(spark, emb, k = 8)
    val assigned = IvfIndex.assign(spark, emb, model).cache()
    val query = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val exact = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"),
          lit(query.toArray).cast("array<float>")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    val ivfAll = IvfIndex.search(spark, assigned.filter(col("vec_id") =!= 0), model,
        query, k = 10, nProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivfAll == exact)
  }

  test("partial probe reaches reasonable recall at a fraction of the scan") {
    import spark.implicits._
    val model = IvfIndex.train(spark, emb, k = 16)
    val assigned = IvfIndex.assign(spark, emb, model).cache()
    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    var hit = 0
    var total = 0
    queries.foreach { case (qid, qv) =>
      val exact = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"),
          round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"),
            lit(qv.toArray).cast("array<float>")), 6).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      val approx = IvfIndex.search(spark, assigned.filter(col("vec_id") =!= qid), model,
          qv, k = 10, nProbe = 4)
        .select("vec_id").as[Long].collect().toSet
      hit += exact.intersect(approx).size
      total += exact.size
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.3, s"recall@10 with nProbe=4/16 was $recall")
  }
}
