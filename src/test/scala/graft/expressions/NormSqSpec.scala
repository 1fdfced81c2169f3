package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Rule[LogicalPlan] extension point: SelfDotToNormSq must rewrite
  * self-dot-products, leave genuine two-argument dots alone, and be
  * numerically invisible (identical fold order).
  */
class NormSqSpec extends SparkTestBase {

  private lazy val emb = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet")
  }

  test("dot_product(a, a) is rewritten to norm_sq by the optimizer") {
    val df = emb.select(col("vec_id"),
      GraftFunctions.dot_product(col("embedding"), col("embedding")).as("nsq"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("norm_sq"), optimized)
    assert(!optimized.contains("dot_product"), optimized)
  }

  test("dot_product(a, b) with different children is NOT rewritten") {
    val df = emb.select(
      GraftFunctions.dot_product(col("embedding"), reverse(col("embedding"))).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), optimized)
  }

  test("rewrite is numerically exact vs the higher-order-function fold") {
    val viaRule = emb.select(col("vec_id"),
        GraftFunctions.dot_product(col("embedding"), col("embedding")).as("n"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    val viaHof = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.normSq(col("embedding")).as("n"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    assert(viaRule.sameElements(viaHof))
  }

  test("norm_sq is callable from SQL and null-safe") {
    emb.createOrReplaceTempView("emb_nsq")
    val n = spark.sql(
      "SELECT norm_sq(embedding) AS n FROM emb_nsq WHERE norm_sq(embedding) > 0")
      .count()
    assert(n > 0)
    val nullRow = spark.sql("SELECT norm_sq(CAST(NULL AS ARRAY<FLOAT>)) AS n")
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }
}
