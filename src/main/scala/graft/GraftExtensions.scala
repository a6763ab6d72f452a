package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FiletimeToTimestamp, HammingDistance}

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
  }
}
