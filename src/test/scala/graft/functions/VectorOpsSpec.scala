package graft.functions

import graft.SparkTestBase
import graft.expressions.GraftFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkTestBase {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("codegen cosine expression == higher-order-function formulation, bitwise") {
    import spark.implicits._
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea")).filter(col("ia") < 40)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb")).filter(col("ib") < 40)
    val pairs = a.join(b, col("ia") < col("ib"))
    val diffs = pairs.select(
        VectorFunctions.cosineSim(col("ea"), col("eb")).as("fast"),
        VectorFunctions.cosineSimHof(col("ea"), col("eb")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diffs == 0)
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val sims = emb.limit(50)
      .select(VectorFunctions.cosineSim(col("embedding"), col("embedding")).as("s"))
      .as[Double].collect()
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("dot_product expression matches aggregate/zip_with dot") {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea")).filter(col("ia") < 30)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb")).filter(col("ib") < 30)
    val diffs = a.join(b, col("ia") < col("ib"))
      .select(GraftFunctions.dot_product(col("ea"), col("eb")).as("fast"),
        VectorFunctions.dot(col("ea"), col("eb")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diffs == 0)
  }

  test("cosine_sim is SQL-callable after registration") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_test")
    val n = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS s
        |FROM emb_test a JOIN emb_test b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).count()
    assert(n == 1)
  }

  test("null array input yields null similarity") {
    GraftFunctions.register(spark)
    val row = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect()(0)
    assert(row.isNullAt(0))
  }

  test("zero-norm vector yields null, never NaN — and never ranks in top-k") {
    GraftFunctions.register(spark)
    // interpreted path
    val r1 = spark.sql(
      "SELECT cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))").collect()(0)
    assert(r1.isNullAt(0))
    // codegen path over a frame with one zero vector: desc sort must put it last
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(0.5f, 0.5f)))
      .toDF("id", "v")
    val top = df.select(col("id"),
        VectorFunctions.cosineSim(col("v"), lit(Array(1.0f, 0.0f))).as("sim"))
      .orderBy(desc("sim"), col("id"))
      .collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
    assert(top(2).isNullAt(1))
  }

  test("brute-force knn returns k rows ordered by similarity desc") {
    import spark.implicits._
    val out = graft.queries.VectorQueries.queries.find(_.name == "v01_knn_bruteforce").get
      .fn(spark, sf)
    val sims = out.select("sim").as[Double].collect()
    assert(sims.length == 10)
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
  }

  test("LSH buckets: same vector always lands in the same bucket (determinism)") {
    val q = graft.queries.VectorQueries.queries.find(_.name == "v06_lsh_ann").get
    val r1 = q.fn(spark, sf).collect().map(_.toString).sorted
    val r2 = q.fn(spark, sf).collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
  }
}
