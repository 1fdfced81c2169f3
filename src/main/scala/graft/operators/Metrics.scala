package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline running stats (SURVEY.md §2.A A19): the reference keeps Python
  * counters for files/chunks ok/failed and ingested totals (main.py:232-238,
  * 317-321). Distributed equivalent: `Dataset.observe` metrics — computed on
  * the executors as the job runs, no extra pass, collected on the driver via
  * `Observation` (batch) or StreamingQueryListener (streaming).
  */
object Metrics {

  /** Attach ingest counters to a canonical chunk-store DataFrame. Read the
    * results from the returned Observation after an action runs.
    */
  def observeIngest(df: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("ingest_stats")
    val observed = df.observe(obs,
      count(lit(1)).as("n_chunks"),
      // exact COUNT(DISTINCT) is disallowed inside observe metrics; rsd
      // 0.005 keeps HLL++ in its sparse (exact) regime well past any real
      // per-pipeline file count (the default 0.05 already misestimates at
      // 20 distinct: 19)
      approx_count_distinct(col("filename"), 0.005).as("n_files"),
      sum(when(graft.functions.VectorFunctions.normSq(col("content_vector")) === 0.0, 1L)
        .otherwise(0L)).as("n_zero_vectors"),
      sum(length(col("content"))).as("total_chars"))
    (observed, obs)
  }
}
