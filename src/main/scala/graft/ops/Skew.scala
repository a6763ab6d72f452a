package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (100 TB concern: one hot key melts one
  * reducer while the rest idle).
  *
  * [[saltedJoin]] splits every hot-side row across `salts` sub-keys and
  * replicates the build side once per salt — turning one skewed reducer
  * into `salts` balanced ones. AQE's skew-join handles this adaptively
  * for sort-merge joins; the explicit salt is the deterministic tool
  * when AQE can't see the skew (e.g. building aggregation state rather
  * than joining, or a broadcast-unfriendly mid-size build side).
  */
object Skew {

  /** Inner equi-join `left.key == right.key` with the left side salted.
    *
    * @param salts number of sub-keys per join key (parallelism multiplier
    *              for the hottest key)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int): DataFrame = {
    // left rows get a deterministic salt from a high-entropy column hash;
    // right rows are replicated across all salts
    val saltedLeft = left.withColumn(
      "__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLeft
      .join(
        saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
