package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.source.Mailbox

/** Late materialization (A10; SURVEY.md §3.3 / §4.4): the reference's
  * engine rewrite — run filter/order/limit over a *narrow* scan carrying
  * only the needed column plus the virtual row-id columns, then re-join
  * the few surviving row ids against a second scan that materializes all
  * columns (reference pst_extension.cpp:26-34; HASH_JOIN asserted in
  * query_optimizations.test:49-53).
  *
  * Catalyst has no such rewrite for V2 sources, so the shape is encoded
  * explicitly. At 100 TB this is the difference between sorting 26 wide
  * columns and sorting one: the narrow scan parses a single field per
  * row (projection pushdown), and the wide scan materializes ≤k rows via
  * a broadcast hash join on (__partition, __node_id).
  */
object LateMaterialization {

  /** `SELECT * FROM mode(path) WHERE pred(narrowCol) ORDER BY narrowCol
    * LIMIT k` with the two-phase row-id plan.
    */
  def filterSortLimit(
      spark: SparkSession,
      path: String,
      mode: String,
      narrowCol: String,
      pred: Column => Column,
      k: Int,
      options: Map[String, String] = Map.empty): DataFrame = {
    val vopts = options + ("virtual_columns" -> "true")
    val narrow = Mailbox
      .read(spark, path, mode, vopts)
      .select(col(narrowCol), col("__partition"), col("__node_id"))
      .filter(pred(col(narrowCol)))
      .orderBy(col(narrowCol))
      .limit(k)
      .select(col("__partition"), col("__node_id"), col(narrowCol).as("__sort_key"))
    val wide = Mailbox.read(spark, path, mode, vopts)
    narrow
      .join(wide, Seq("__partition", "__node_id"))
      .orderBy(col("__sort_key"))
      .drop("__sort_key", "__partition", "__node_id")
  }
}
