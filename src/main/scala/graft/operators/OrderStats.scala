package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact percentiles as ORDER STATISTICS instead of Spark's `percentile`
  * aggregate (round-18 optimization; distributed variant + group-semantics
  * fix in round 19).
  *
  * Why not the aggregate: `percentile`/`median` build a per-group
  * OpenHashMap[value → count] in every partial aggregate, merge the boxed
  * maps in ONE final task per group, then sort the merged map to
  * interpolate — boxing-heavy (measured gc_ms 343 on r38's 600k rows) and,
  * at scale, a per-group memory funnel (guide §5 "per-task state too
  * large": one reducer holds a group's entire distinct-value map).
  *
  * TWO physical strategies, selected by `spark.graft.percentile.mode`
  * (the ScaleOps.checkpoint.mode seam pattern — one conf, no rewrite):
  *
  *   - `window` (default): one per-group window sort of primitives —
  *     spillable, codegen, a single exchange. The group's rows do land in
  *     one task (the same serial-funnel class as the aggregate's final
  *     merge, but spilling instead of OOMing); measured FASTER at local
  *     scale than the distributed form (r38+r71: 3.0 s vs 4.8 s at sf0.1 —
  *     the extra exchange + materialization outweigh a funnel that tiny
  *     groups never feel).
  *   - `distributed`: NO per-group single-task stage over data-sized input
  *     — duplicate compression (groupBy(g, v).count, the aggregate's
  *     map-side reduction), a distributed range sort whose big groups span
  *     many partitions, and global ranks from a two-level cumulative sum
  *     (shuffle-free local running counts + per-fragment offsets whose
  *     only per-group-ordered pass runs over partition-count-sized
  *     subtotal rows). The right shape when single groups outgrow one
  *     task's sort budget (the 100 TB geometry).
  *
  * Both reproduce PercentileBase.getPercentile STEP FOR STEP (verified
  * against the spark-catalyst 4.1.2 bytecode, and property-tested for exact
  * double equality in OrderStatsSpec, in BOTH modes):
  *   position = (N − 1) · p                        (N = non-null count)
  *   lower = floor(position); higher = ceil(position)
  *   lowerKey  = value at 1-based rank lower + 1   (ties expand like rows)
  *   higherKey = value at 1-based rank higher + 1
  *   if higher == lower                 → lowerKey
  *   else if higherKey == lowerKey      → lowerKey
  *   else (higher − position) · lowerKey + (position − lower) · higherKey
  * Ranks index the expanded multiset identically in the sorted-rows view,
  * the (value, count) view, and the aggregate's sorted-map view; doubles go
  * through the same IEEE operations in the same order.
  *
  * Group semantics match the aggregate's exactly (round-19 fix): a group
  * whose values are ALL null — including a null group KEY — surfaces with
  * null percentiles, where the round-18 form silently dropped it (nulls
  * rank AFTER every value via NULLS LAST / zero counts, so they can never
  * be selected, but they keep their group's row alive).
  */
object OrderStats {

  /** `window` (default) or `distributed` — see the object scaladoc. */
  val PercentileModeConf = "spark.graft.percentile.mode"

  /** One row per group: `(groupCol, <out>_0 ... <out>_{k-1})` — the exact
    * percentiles of `valueCol` (nulls skipped, like the aggregate) at each
    * point in `ps`. `df` needs `groupCol` and a numeric `valueCol`.
    */
  def exactPercentilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                              ps: Seq[Double], out: String): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile points must be in [0, 1]: $ps")
    df.sparkSession.conf.get(PercentileModeConf, "window") match {
      case "window" => windowForm(df, groupCol, valueCol, ps, out)
      case "distributed" => distributedForm(df, groupCol, valueCol, ps, out)
      case other => throw new IllegalArgumentException(
        s"$PercentileModeConf must be window|distributed, got '$other'")
    }
  }

  /** Convenience single-point form: `(groupCol, <out>)`. */
  def exactPercentileByGroup(df: DataFrame, groupCol: String, valueCol: String,
                             p: Double, out: String): DataFrame =
    exactPercentilesByGroup(df, groupCol, valueCol, Seq(p), out)
      .withColumnRenamed(s"${out}_0", out)

  /** Shared interpolation tail: `picked` carries per-group
    * `__lv\$i`/`__hv\$i`/`__pos\$i` aggregates (all null for an all-null
    * group, which then interpolates to null exactly like the aggregate).
    */
  private def interpolate(picked: DataFrame, groupOut: Column, groupName: String,
                          ps: Seq[Double], out: String): DataFrame = {
    val outs = ps.indices.map { i =>
      val p = col(s"__pos$i"); val l = floor(p); val h = ceil(p)
      val lv = col(s"__lv$i"); val hv = col(s"__hv$i")
      when(h === l, lv)
        .when(hv === lv, lv)
        .otherwise((h - p) * lv + (p - l) * hv)
        .as(s"${out}_$i")
    }
    picked.select(groupOut.as(groupName) +: outs: _*)
  }

  /** The single-window form: rank with NULLS LAST so null values sit past
    * every selectable rank while keeping all-null groups alive; `__n`
    * counts non-null values only.
    */
  private def windowForm(df: DataFrame, groupCol: String, valueCol: String,
                         ps: Seq[Double], out: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("__v").asc_nulls_last)
    val wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(col("__v")).over(wn))
    val pos = (i: Int) => (col("__n") - 1).cast("double") * lit(ps(i))
    val lo = (i: Int) => floor(pos(i))
    val hi = (i: Int) => ceil(pos(i))
    // keep only the rows whose rank any point's interpolation touches —
    // plus one representative row of an all-null group (__n = 0), whose
    // null aggregates carry the group to the output like the aggregate
    val needed = ps.indices
      .map(i => col("__rn") === lo(i) + 1 || col("__rn") === hi(i) + 1)
      .reduce(_ || _) || (col("__n") === 0 && col("__rn") === 1)
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
    interpolate(picked, col(groupCol), groupCol, ps, out)
  }

  /** The funnel-free distributed form — see the object scaladoc. */
  private def distributedForm(df: DataFrame, groupCol: String, valueCol: String,
                              ps: Seq[Double], out: String): DataFrame = {
    val spark = df.sparkSession
    // 1. duplicate compression (map-side partial aggregation): the shuffle
    //    carries one row per distinct (group, value), not per input row —
    //    ONE scan of the input serves everything downstream. A null value
    //    lands with __c = 0 (count of a null column): an empty rank
    //    interval no selection can pick, but its group stays visible. The
    //    group key travels as a one-field STRUCT: the fragment equi-join
    //    below must keep a NULL group key, and struct equality treats null
    //    fields as equal where a bare-column equi-join would drop the rows.
    val compressed = df
      .select(struct(col(groupCol)).as("__g"), col(valueCol).cast("double").as("__v"))
      .groupBy("__g", "__v").agg(count(col("__v")).as("__c"))
    // 2. distributed range sort — one group's values span many partitions.
    //    Materialized ONCE: the subtotal and rank branches must see one
    //    consistent partition layout, and neither may re-run the scan.
    val sorted = ScaleOps.checkpointed(
      compressed.repartitionByRange(col("__g"), col("__v"))
        .sortWithinPartitions("__g", "__v")
        .withColumn("__pid", spark_partition_id()))
    // 3a. per-(partition, group) subtotals → per-fragment global offsets
    //     AND per-group totals in one tiny frame (one row per partition ×
    //     group fragment; both windows share the __g exchange). The offset
    //     prefix sum is the only per-group-ordered pass, over
    //     partition-count-sized rows.
    val wOff = Window.partitionBy("__g").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("__g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val frag = sorted.groupBy("__pid", "__g").agg(sum("__c").as("__pc"))
      .withColumn("__off", sum("__pc").over(wOff) - col("__pc"))
      .withColumn("__n", sum("__pc").over(wTot))
      .select("__pid", "__g", "__off", "__n")
    // 3b. local running count per (partition, group) — a SHUFFLE-FREE
    //     narrow pass: rows are already sorted by (g, v) and
    //     group-contiguous inside every checkpointed partition, so the
    //     running sum needs no window exchange (a Window.partitionBy(pid,
    //     g) would reshuffle the whole compressed table just to regroup
    //     rows that are already grouped).
    val lcSchema = sorted.schema.add("__lc", LongType, nullable = false)
    val withLc = spark.createDataFrame(
      sorted.rdd.mapPartitions { it =>
        var curG: Any = null
        var started = false
        var run = 0L
        it.map { r =>
          val g = r.get(0)
          if (!started || g != curG) { curG = g; run = 0L; started = true }
          run += r.getLong(2)
          Row(r.get(0), r.get(1), r.getLong(2), r.getInt(3), run)
        }
      }, lcSchema)
    val ranked = withLc
      .join(frag, Seq("__pid", "__g"))
      .withColumn("__cumHi", col("__off") + col("__lc"))
      .withColumn("__cumLo", col("__cumHi") - col("__c") + lit(1L))
    // 4. keep only rows whose rank interval covers an interpolation rank —
    //    plus every row of an all-null group (__n = 0)
    val pos = (i: Int) => (col("__n") - 1).cast("double") * lit(ps(i))
    val lo = (i: Int) => floor(pos(i))
    val hi = (i: Int) => ceil(pos(i))
    def covers(rank: Column): Column =
      col("__cumLo") <= rank && rank <= col("__cumHi")
    val needed = ps.indices
      .map(i => covers(lo(i) + 1) || covers(hi(i) + 1))
      .reduce(_ || _) || col("__n") === 0
    val aggs = ps.indices.flatMap { i =>
      Seq(
        max(when(covers(lo(i) + 1), col("__v"))).as(s"__lv$i"),
        max(when(covers(hi(i) + 1), col("__v"))).as(s"__hv$i"),
        max(when(covers(lo(i) + 1), pos(i))).as(s"__pos$i"))
    }
    val picked = ranked.filter(needed)
      .groupBy("__g")
      .agg(aggs.head, aggs.tail: _*)
    interpolate(picked, col("__g").getField(groupCol), groupCol, ps, out)
  }
}
