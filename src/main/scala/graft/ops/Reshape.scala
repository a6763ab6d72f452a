package graft.ops

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.functions._

/** Reshaping + native session windows. */
object Reshape {

  /** q_session_window — Spark's native session_window (30-minute gap)
    * per user. The oracle is the manual gap-break formulation
    * (lag + cumulative sum), which defines identical session boundaries:
    * a session's start is its first event, sessions split when the gap
    * exceeds 30 minutes.
    */
  val qSessionWindow = Q(
    "q_session_window",
    (s, d) =>
      Tables
        .events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          Exact.dsum(col("value")).as("total_value"))
        .select(
          col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("n_events"),
          col("total_value"))
        .orderBy("user_id", "session_start"),
    Some(
      """WITH brk AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM brk)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
    )
  )

  /** q_unpivot — wide→long melt: per-status counts as (status_kind,
    * cnt) rows. Spark unpivot ↔ DuckDB UNPIVOT.
    */
  val qUnpivot = Q(
    "q_unpivot",
    (s, d) => {
      val wide = Tables
        .orders(s, d)
        .groupBy("o_custkey")
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"))
      wide
        .unpivot(
          Array(col("o_custkey")),
          Array(col("n_open"), col("n_filled"), col("n_pending")),
          "status_kind",
          "cnt")
        .orderBy("o_custkey", "status_kind")
    },
    Some(
      """SELECT o_custkey, status_kind, cnt FROM (
        |  SELECT o_custkey,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |  FROM orders GROUP BY o_custkey) w
        |UNPIVOT (cnt FOR status_kind IN (n_open, n_filled, n_pending))
        |ORDER BY o_custkey, status_kind""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qSessionWindow, qUnpivot)
}
