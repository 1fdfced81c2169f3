package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession, SparkSessionExtensions}

/** User-facing API + extension registration for the native as-of join. */
object AsOf {

  /** Backward as-of join: each left row gets the latest right row with the
    * same `key` and `rightTimeCol` strictly before its `leftTimeCol`
    * (nulls when none). Right-side column names must not collide with the
    * left's — rename before joining (also breaks self-join attribute
    * ambiguity).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTimeCol: String, rightKey: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    GraftShim.registerStrategy(spark, AsOfJoinStrategy)
    val lp = GraftShim.analyzed(left)
    val rp = GraftShim.analyzed(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${plan.output.map(_.name).mkString(",")}"))
    GraftShim.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, key), attr(rp, rightKey), attr(lp, leftTimeCol), attr(rp, rightTimeCol)))
  }
}

/** `SparkSessionExtensions` registration path (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`) — the
  * production-cluster alternative to experimental.extraStrategies.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.expressions.SelfDotToNormSq)
  }
}
