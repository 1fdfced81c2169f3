package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management helpers (SURVEY.md §2.B partitioning row;
  * the 100 TB levers): salting for skewed join keys, explicit co-partitioning.
  * AQE's skew-join handling covers most cases at runtime; salting is the
  * static fallback when a single key exceeds what one task can hold.
  */
object ScaleOps {

  /** Salted equi-join for a skewed big side against a non-broadcastable
    * small side: the big side spreads each hot key over `saltBuckets`
    * partitions (salt derived deterministically from `saltSource`, NOT
    * rand() — reproducibility), the small side is replicated `saltBuckets`
    * times. Join runs on (key, salt); result == plain equi-join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, saltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Co-partition two frames on the join key before a sequence of joins /
    * aggregations over the same key — one shuffle, reused by every
    * downstream stage (Catalyst recognizes the existing hash partitioning).
    */
  def coPartition(df: DataFrame, key: String, numPartitions: Int): DataFrame =
    df.repartition(numPartitions, col(key))
}
