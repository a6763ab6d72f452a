package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** User API for the custom as-of join operator. */
object AsofJoinOps {

  /** `left ASOF JOIN right ON left.key = right.key AND right.time <=
    * left.time (latest)`. Key and time columns must be LongType (the
    * merge exec compares them natively); column names of the two sides
    * must be disjoint.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark = left.sparkSession
    // idempotent runtime registration so the operator also works on
    // sessions built without GraftExtensions (e.g. the driver harness)
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = {
      val a = plan.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
      require(a.dataType == LongType, s"$name must be BIGINT for asof join")
      a
    }
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"asof join sides share column names: $overlap")
    ColumnBridge.ofRows(
      spark,
      AsofJoin(
        lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
