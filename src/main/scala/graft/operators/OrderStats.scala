package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles as ORDER STATISTICS instead of Spark's `percentile`
  * aggregate (round-18 optimization).
  *
  * Why: `percentile`/`median` build a per-group OpenHashMap[value → count]
  * in every partial aggregate, merge the boxed maps in ONE final task per
  * group, then sort the merged map to interpolate — boxing-heavy (measured
  * gc_ms 343 on r38's 600k rows) and, at scale, a per-group memory funnel
  * (the guide's §5 "per-task state too large" class: one reducer holds a
  * group's entire distinct-value map). The order-statistics plan sorts the
  * group ONCE in a window (primitive, spillable, codegen), keeps only the
  * ~2·|points| rows whose ranks the interpolation touches, and aggregates
  * those — shuffle mass unchanged, no boxed map, no single-task merge.
  *
  * Numerically IDENTICAL to `percentile(value, array(ps))`, not just close:
  * this reproduces PercentileBase.getPercentile step for step (verified
  * against the spark-catalyst 4.1.2 bytecode, and property-tested for exact
  * double equality in OrderStatsSpec):
  *   position = (N − 1) · p                        (N = non-null count)
  *   lower = floor(position); higher = ceil(position)
  *   lowerKey  = value at 1-based rank lower + 1   (ties expand like rows)
  *   higherKey = value at 1-based rank higher + 1
  *   if higher == lower                 → lowerKey
  *   else if higherKey == lowerKey      → lowerKey
  *   else (higher − position) · lowerKey + (position − lower) · higherKey
  * The sorted-rows view and the sorted-(value, count)-map view agree because
  * ranks index the expanded multiset either way; doubles go through the same
  * IEEE operations in the same order.
  */
object OrderStats {

  /** One row per group: `(groupCol, <out>_0 ... <out>_{k-1})` — the exact
    * percentiles of `valueCol` (nulls skipped, like the aggregate) at each
    * point in `ps`. `df` needs `groupCol` and a numeric `valueCol`.
    */
  def exactPercentilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                              ps: Seq[Double], out: String): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile points must be in [0, 1]: $ps")
    val w = Window.partitionBy(groupCol).orderBy(col("__v"))
    val wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
    val pos = (i: Int) => (col("__n") - 1).cast("double") * lit(ps(i))
    val lo = (i: Int) => floor(pos(i))
    val hi = (i: Int) => ceil(pos(i))
    // keep only the rows whose rank any point's interpolation touches —
    // everything else is dead after the sort
    val needed = ps.indices
      .map(i => col("__rn") === lo(i) + 1 || col("__rn") === hi(i) + 1)
      .reduce(_ || _)
    val aggs = ps.indices.flatMap { i =>
      Seq(
        max(when(col("__rn") === lo(i) + 1, col("__v"))).as(s"__lv$i"),
        max(when(col("__rn") === hi(i) + 1, col("__v"))).as(s"__hv$i"),
        // per-group scalars (constant within the group) ride along via max
        max(when(col("__rn") === lo(i) + 1, pos(i))).as(s"__pos$i"))
    }
    val picked = ranked.filter(needed)
      .groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
    val outs = ps.indices.map { i =>
      val p = col(s"__pos$i"); val l = floor(p); val h = ceil(p)
      val lv = col(s"__lv$i"); val hv = col(s"__hv$i")
      when(h === l, lv)
        .when(hv === lv, lv)
        .otherwise((h - p) * lv + (p - l) * hv)
        .as(s"${out}_$i")
    }
    picked.select(col(groupCol) +: outs: _*)
  }

  /** Convenience single-point form: `(groupCol, <out>)`. */
  def exactPercentileByGroup(df: DataFrame, groupCol: String, valueCol: String,
                             p: Double, out: String): DataFrame =
    exactPercentilesByGroup(df, groupCol, valueCol, Seq(p), out)
      .withColumnRenamed(s"${out}_0", out)
}
