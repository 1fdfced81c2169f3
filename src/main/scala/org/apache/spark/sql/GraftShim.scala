package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public Column
  * API (Spark 4's Column wraps a ColumnNode; the Expression converters live
  * in the private[sql] classic package). Standard extension-library shim —
  * the only file outside the graft namespace.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (classic Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Drain the listener bus so SparkListener-accumulated metrics are
    * complete before a snapshot (waitUntilEmpty is private[spark]).
    * BEST-EFFORT: a drain that exceeds the bound (event flood on a loaded
    * host) only skews one rep's work counters — it must never abort the
    * caller's run, so the timeout is swallowed.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Stop the JVM-global streaming state-store maintenance threads.
    * They outlive SparkSession.stop() and keep polling the DEAD session's
    * StateStoreCoordinator RPC endpoint — a same-JVM sequential-sessions
    * harness (ClusterSmoke) otherwise logs a storm of
    * RpcEndpointNotFoundException while the next session runs.
    */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()

  /** Idempotently add a planner strategy to the session. */
  def registerStrategy(spark: SparkSession,
                       s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
