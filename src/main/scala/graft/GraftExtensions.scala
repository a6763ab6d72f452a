package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProductQ, FiletimeToTimestamp, HammingDistance}

/** Algebraic simplification of graft's own expressions — a
  * Rule[LogicalPlan] injected as an optimizer rule: `hamming_distance
  * (x, x)` is 0 for any deterministic x, so the (possibly expensive)
  * comparison never runs. The pattern every self-join distance filter
  * produces on its diagonal. NULL inputs must still null-propagate
  * (hamming_distance(NULL, NULL) is NULL, not 0), so a nullable operand
  * keeps an IsNull guard instead of folding to a bare 0.
  */
object SimplifyGraftExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HammingDistance(a, b) if a.deterministic && a.semanticEquals(b) =>
        if (a.nullable) If(IsNull(a), Literal(null, IntegerType), Literal(0, IntegerType))
        else Literal(0, IntegerType)
    }
}

/** SparkSessionExtensions entry point: injects graft's custom
  * expressions into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — the standing registration
  * path, vs. GraftFunctions.register's per-session temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("filetime_to_timestamp"),
        new ExpressionInfo(classOf[FiletimeToTimestamp].getName, "filetime_to_timestamp"),
        (exprs: Seq[Expression]) => FiletimeToTimestamp(exprs.head)))
    ext.injectFunction(
      (
        new FunctionIdentifier("hamming_distance"),
        new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
        (exprs: Seq[Expression]) => HammingDistance(exprs.head, exprs(1))))
    ext.injectFunction(
      (
        new FunctionIdentifier("dot_product_q"),
        new ExpressionInfo(classOf[DotProductQ].getName, "dot_product_q"),
        (exprs: Seq[Expression]) => DotProductQ(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => SimplifyGraftExpressions)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
