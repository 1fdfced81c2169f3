package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom stateful streaming (SURVEY.md §2.B UDF/streaming rows:
  * `KeyValueGroupedDataset.flatMapGroupsWithState`): explicit per-key state
  * where the built-in operators don't fit.
  *
  * Scale notes: state lives in the state store partitioned by key — the
  * shuffle is on the grouping key only, state size is bounded by key
  * cardinality (use timeouts to expire idle keys on unbounded streams).
  */
object StatefulOps {

  final case class KeySeen(key: String)

  /** Cross-batch first-arrival dedup with explicit state (A12 streaming
    * form): emits a key the first time it is seen, drops it afterwards —
    * across micro-batches, unlike `dropDuplicates` within a watermark.
    */
  def statefulDedup(spark: SparkSession, events: DataFrame, keyCols: Seq[String]): Dataset[String] = {
    import spark.implicits._
    events
      .select(concat_ws("|", keyCols.map(col): _*).as("k"))
      .as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[Boolean, String](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, _: Iterator[String], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(key) }
      }
  }

  final case class UserStats(userId: Long, nEvents: Long, total: Double)

  /** Running per-user counters with explicit state (A19 streaming form):
    * each micro-batch emits the updated cumulative stats for users seen in
    * that batch.
    */
  def runningUserStats(spark: SparkSession, events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update((n, total))
          Iterator.single(UserStats(userId, n, total))
      }
  }

  /** Per-user running totals on the transformWithState API (Spark 4.x
    * arbitrary-state v2): typed ValueState, explicit TimeMode, optional
    * per-state TTL. Unlike flatMapGroupsWithState, state variables are
    * named and independently evolvable, and the processor supports timers —
    * the API the engine standardizes on for new stateful operators.
    */
  class UserTotalsProcessor extends StatefulProcessor[Long, (Long, Double), UserStats] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[UserStats] = {
      var (n, total) = Option(totals.get()).getOrElse((0L, 0.0))
      rows.foreach { case (_, v) => n += 1; total += v }
      totals.update((n, total))
      Iterator.single(UserStats(key, n, total))
    }
  }

  /** transformWithState requires the RocksDB state store provider. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def runningUserStatsTws(spark: SparkSession, events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
