package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftShim

/** Column wrappers + SQL registration for the engine's native Catalyst
  * expressions. After `register(spark)`, `cosine_sim` / `dot_product` are
  * callable from `spark.sql` as well.
  */
object GraftFunctions {

  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.column(CosineSimilarity(GraftShim.expression(a), GraftShim.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  def nfc_normalize(s: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(s)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(GraftShim.expression(a), GraftShim.expression(b)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("norm_sq",
      exprs => NormSq(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("chunk_text",
      exprs => ChunkTextGenerator(exprs), "built-in")
    registry.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)), "built-in")
    if (!spark.experimental.extraOptimizations.contains(SelfDotToNormSq))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotToNormSq
  }
}
