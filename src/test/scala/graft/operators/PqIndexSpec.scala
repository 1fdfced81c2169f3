package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkTestBase {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("training is deterministic and codebooks have the declared shape") {
    val m1 = PqIndex.train(spark, emb, nCells = 8, m = 8, codes = 16)
    val m2 = PqIndex.train(spark, emb, nCells = 8, m = 8, codes = 16)
    assert(m1.codebooks.length == 8)
    m1.codebooks.foreach { book =>
      assert(book.length <= 16 && book.head.length == m1.subDim)
    }
    m1.codebooks.zip(m2.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("coarse training routes past maxTrainCells to the distributed trainer") {
    // maxTrainCells = 4 forces the routing at spec size; the coarse
    // geometry must be the distributed trainer's, verbatim, and the
    // model must still encode/search (codebooks train on the bounded
    // sample regardless of the coarse path)
    val routed = PqIndex.train(spark, emb, nCells = 8, maxTrainCells = 4)
    val direct = IvfIndex.trainDistributed(spark, emb, k = 8)
    routed.coarse.centroids.zip(direct.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    assert(routed.codebooks.nonEmpty)
    val encoded = PqIndex.encode(spark, emb, routed)
    assert(encoded.count() == emb.count())
  }

  test("codes are m bytes per vector — the 32x memory claim") {
    import spark.implicits._
    val model = PqIndex.train(spark, emb, nCells = 8, m = 8, codes = 16)
    val encoded = PqIndex.encode(spark, emb, model)
    assert(encoded.count() == emb.count())
    val lens = encoded.select(length(col("code"))).distinct()
      .as[Int].collect().toSeq
    assert(lens == Seq(8), s"code lengths: $lens")
  }

  test("all-cells probe + corpus-wide shortlist + re-rank == exact top-k") {
    import spark.implicits._
    val model = PqIndex.train(spark, emb, nCells = 8, m = 8, codes = 16)
    val encoded = PqIndex.encode(spark, emb, model).cache()
    val n = emb.count().toInt
    val query = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val exact = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"),
          lit(query.toArray).cast("array<float>")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    // when nothing is pruned (all cells, shortlist = corpus) the exact
    // re-rank must erase every quantization error
    val pq = PqIndex.search(spark, encoded.filter(col("vec_id") =!= 0), emb, model,
        query, k = 10, nProbe = 8, shortlist = n)
      .select("vec_id").as[Long].collect().toSeq
    assert(pq == exact)
  }

  test("pruned probe + bounded shortlist keeps useful recall") {
    import spark.implicits._
    val model = PqIndex.train(spark, emb)
    val encoded = PqIndex.encode(spark, emb, model).cache()
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
      val approx = PqIndex.search(spark, encoded.filter(col("vec_id") =!= qid), emb,
          model, qv, k = 10, nProbe = 4, shortlist = 50)
        .select("vec_id").as[Long].collect().toSet
      hit += (exact & approx).size
      total += exact.size
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.3, s"recall@10 over 5 queries = $recall")
  }
}
