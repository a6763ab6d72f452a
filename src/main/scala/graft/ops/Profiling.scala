package graft.ops

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality observability operators: the profiling / completeness
  * checks a pipeline runs over every ingested table before anything
  * downstream trusts it.
  */
object Profiling {

  /** q_profile — per-column profile of the orders table (row count,
    * null count, distinct count, numeric min/max, string min/max) in
    * ONE aggregation pass: all column stats are computed in a single
    * wide aggregate over one scan, then pivoted to a row per column
    * with a 1-row explode — never one scan per column.
    *
    * 100 TB shape: one scan + one partial-aggregated single-group
    * aggregate; the shuffle carries a handful of partial stats per
    * task. (count_distinct expands to per-column distinct aggregates —
    * Spark plans them as one multi-distinct aggregate, the same shape
    * as q_multi_distinct.)
    */
  val qProfile = Q(
    "q_profile",
    (s, d) => {
      val o = Tables.orders(s, d)
      def nNull(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
      val agg = o.agg(
        count(lit(1)).as("n"),
        nNull("o_orderkey").as("nn_key"),
        count_distinct(col("o_orderkey")).as("nd_key"),
        min(col("o_orderkey")).cast("double").as("mn_key"),
        max(col("o_orderkey")).cast("double").as("mx_key"),
        nNull("o_totalprice").as("nn_price"),
        count_distinct(col("o_totalprice")).as("nd_price"),
        min(col("o_totalprice")).as("mn_price"),
        max(col("o_totalprice")).as("mx_price"),
        nNull("o_orderstatus").as("nn_status"),
        count_distinct(col("o_orderstatus")).as("nd_status"),
        min(col("o_orderstatus")).as("mn_status"),
        max(col("o_orderstatus")).as("mx_status"))
      val nil = lit(null).cast("double")
      val nilS = lit(null).cast("string")
      agg.select(explode(array(
        struct(lit("o_orderkey").as("col_name"), col("n").as("n"),
          col("nn_key").as("n_null"), col("nd_key").as("n_distinct"),
          col("mn_key").as("min_num"), col("mx_key").as("max_num"),
          nilS.as("min_s"), nilS.as("max_s")),
        struct(lit("o_orderstatus").as("col_name"), col("n").as("n"),
          col("nn_status").as("n_null"), col("nd_status").as("n_distinct"),
          nil.as("min_num"), nil.as("max_num"),
          col("mn_status").as("min_s"), col("mx_status").as("max_s")),
        struct(lit("o_totalprice").as("col_name"), col("n").as("n"),
          col("nn_price").as("n_null"), col("nd_price").as("n_distinct"),
          col("mn_price").as("min_num"), col("mx_price").as("max_num"),
          nilS.as("min_s"), nilS.as("max_s")))).as("r"))
        .select(col("r.*"))
        .orderBy("col_name")
    },
    Some(
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn_key,
        |    count(DISTINCT o_orderkey) AS nd_key,
        |    CAST(min(o_orderkey) AS DOUBLE) AS mn_key,
        |    CAST(max(o_orderkey) AS DOUBLE) AS mx_key,
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn_price,
        |    count(DISTINCT o_totalprice) AS nd_price,
        |    min(o_totalprice) AS mn_price,
        |    max(o_totalprice) AS mx_price,
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn_status,
        |    count(DISTINCT o_orderstatus) AS nd_status,
        |    min(o_orderstatus) AS mn_status,
        |    max(o_orderstatus) AS mx_status
        |  FROM orders)
        |SELECT col_name, CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
        |  CAST(n_distinct AS BIGINT) AS n_distinct, min_num, max_num, min_s, max_s
        |FROM (
        |  SELECT 'o_orderkey' AS col_name, n, nn_key AS n_null,
        |    nd_key AS n_distinct, mn_key AS min_num, mx_key AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
        |  FROM a
        |  UNION ALL
        |  SELECT 'o_orderstatus', n, nn_status, nd_status,
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_status, mx_status
        |  FROM a
        |  UNION ALL
        |  SELECT 'o_totalprice', n, nn_price, nd_price,
        |    mn_price, mx_price, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  FROM a)
        |ORDER BY col_name""".stripMargin
    )
  )

  /** q_gap_fill — time-series regularization: a complete daily spine
    * from min to max event day, high-value purchase revenue per day
    * left-joined onto it, missing days emitted both as zero-filled and
    * as last-observation-carried-forward. The resample step every
    * metrics/feature pipeline needs before windowed models.
    *
    * 100 TB shape: the spine derives from one tiny (min, max)
    * aggregate — generated, never materialized from data; the join is
    * spine-sized (days), broadcast against the daily aggregate; LOCF is
    * one ordered window over days, not events.
    */
  val qGapFill = Q(
    "q_gap_fill",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value") > 230.0)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(Exact.dsum(col("value")).as("rev"), count(lit(1)).as("n_tx"))
      val spine = Tables.events(s, d)
        .agg(date_trunc("day", min(col("ts"))).as("mn"),
          date_trunc("day", max(col("ts"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("day"), "left_outer")
        .select(col("day").cast("timestamp_ntz").as("day"),
          coalesce(col("rev"), lit(0.0)).as("rev"),
          coalesce(col("n_tx"), lit(0L)).as("n_tx"),
          last(col("rev"), ignoreNulls = true).over(w).as("rev_locf"))
        .orderBy("day")
    },
    Some(
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |    count(*) AS n_tx
        |  FROM events
        |  WHERE event_type = 'purchase' AND value > 230.0e0
        |  GROUP BY 1),
        |bounds AS (
        |  SELECT date_trunc('day', min(ts)) AS mn,
        |    date_trunc('day', max(ts)) AS mx FROM events),
        |spine AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM bounds)
        |SELECT s.day AS day, coalesce(d.rev, 0.0e0) AS rev,
        |  coalesce(d.n_tx, 0) AS n_tx,
        |  last_value(d.rev IGNORE NULLS) OVER (ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_locf
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |ORDER BY day""".stripMargin
    )
  )

  /** q_ewma — exponentially weighted moving average (α = 1/2) of each
    * user's event values over their last 16 events, in EXACT integer
    * arithmetic: values quantized to cents, weights are powers of two
    * (2^15, 2^14, …), the weighted sum and the weight sum are exact
    * BIGINTs, and the EWMA is their one double division. A recursive
    * EWMA (each row from the previous row's state) can't distribute;
    * the bounded-window form is one partitioned window — and with
    * α = 1/2 the dropped tail beyond 16 lags is below 2^-16, under the
    * cent quantum itself.
    */
  val qEwma = Q(
    "q_ewma",
    (s, d) => {
      val wRn = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val base = Tables.events(s, d)
        .filter(col("user_id") < 50)
        .select(col("user_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cv"),
          col("event_id"),
          row_number().over(wRn).as("rn"))
      val cur = base.select(col("user_id"), col("event_id"),
        col("rn").as("rn_t"))
      cur.join(base.select(col("user_id"), col("rn"), col("cv")),
          Seq("user_id"))
        .filter(col("rn") > col("rn_t") - 16 && col("rn") <= col("rn_t"))
        .groupBy("user_id", "event_id", "rn_t")
        .agg(
          sum(col("cv") * expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(15 - (rn_t - rn) AS INT))"))
            .as("num"),
          sum(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(15 - (rn_t - rn) AS INT))"))
            .as("den"))
        .select(col("user_id"), col("event_id"),
          (col("num").cast("double") / col("den") / 100.0).as("ewma"))
        .orderBy("user_id", "event_id")
    },
    Some(
      """WITH base AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id < 50)
        |SELECT c.user_id, c.event_id,
        |  CAST(SUM(p.cv * (CAST(1 AS BIGINT) << CAST(15 - (c.rn - p.rn) AS INT)))
        |      AS DOUBLE)
        |    / SUM(CAST(1 AS BIGINT) << CAST(15 - (c.rn - p.rn) AS INT))
        |    / 100.0 AS ewma
        |FROM base c JOIN base p
        |  ON c.user_id = p.user_id AND p.rn > c.rn - 16 AND p.rn <= c.rn
        |GROUP BY c.user_id, c.event_id, c.rn
        |ORDER BY c.user_id, c.event_id""".stripMargin
    )
  )

  /** q_outliers — per-type z-score anomaly flagging: mean and stddev
    * derive from exact decimal sums (μ = Σx/n, σ² = (nΣx² − (Σx)²)/n²),
    * every engine computes the identical doubles, and the |x−μ| > 3σ
    * cut is a deterministic double comparison — so the outlier SET
    * (not just the scores) is bit-stable cross-engine.
    */
  val qOutliers = Q(
    "q_outliers",
    (s, d) => {
      val stats = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(Exact.dec(col("value"))).as("sx"),
          sum(Exact.dec(col("value")) * Exact.dec(col("value"))).as("sxx"))
        .select(col("event_type"),
          (col("sx").cast("double") / col("n")).as("mu"),
          (sqrt(col("n") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / col("n")).as("sigma"))
      Tables.events(s, d)
        .join(broadcast(stats), "event_type")
        .filter(abs(col("value") - col("mu")) > col("sigma") * 3)
        .select(col("event_type"), col("event_id"), col("value"),
          col("mu"), col("sigma"))
        .orderBy("event_type", "event_id")
    },
    Some(
      """WITH stats AS (
        |  SELECT event_type,
        |    CAST(sx AS DOUBLE) / n AS mu,
        |    sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / n AS sigma
        |  FROM (
        |    SELECT event_type, count(*) AS n,
        |      SUM(CAST(value AS DECIMAL(18,2))) AS sx,
        |      SUM(CAST(value AS DECIMAL(18,2))
        |        * CAST(value AS DECIMAL(18,2))) AS sxx
        |    FROM events GROUP BY event_type))
        |SELECT event_type, event_id, value, mu, sigma
        |FROM events JOIN stats USING (event_type)
        |WHERE abs(value - mu) > sigma * 3
        |ORDER BY event_type, event_id""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qProfile, qGapFill, qEwma, qOutliers)
}
