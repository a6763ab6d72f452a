package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining analytic shapes: histograms, cross join, per-group mode. */
object Extras {

  /** q_histogram — fixed-width value bucketing (the groundwork for any
    * distribution profiling): 50k-wide price buckets.
    */
  val qHistogram = Q(
    "q_histogram",
    (s, d) =>
      Tables
        .orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
    Some(
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin
    )
  )

  /** q_cross_join — explicit cartesian product of two small dims. */
  val qCrossJoin = Q(
    "q_cross_join",
    (s, d) =>
      Tables
        .region(s, d)
        .crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name"),
    Some(
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin
    )
  )

  /** q_mode_per_group — most frequent value per group (mode), with a
    * deterministic count-desc/value-asc tie-break in both engines.
    */
  val qModePerGroup = Q(
    "q_mode_per_group",
    (s, d) => {
      val counts = Tables
        .lineitem(s, d)
        .groupBy("l_returnflag", "l_linenumber")
        .agg(count(lit(1)).as("n"))
      val w = Window
        .partitionBy("l_returnflag")
        .orderBy(col("n").desc, col("l_linenumber").asc)
      counts
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(
          col("l_returnflag"),
          col("l_linenumber").as("mode_linenumber"),
          col("n"))
        .orderBy("l_returnflag")
    },
    Some(
      """SELECT l_returnflag, l_linenumber AS mode_linenumber, n FROM (
        |  SELECT l_returnflag, l_linenumber, count(*) AS n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_linenumber ASC) AS rk
        |  FROM lineitem GROUP BY l_returnflag, l_linenumber) t
        |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qHistogram, qCrossJoin, qModePerGroup)
}
