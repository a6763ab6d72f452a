package graft.ops

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (builder-brief extensions): as-of join,
  * range join, pivot — each composed from built-ins per the preference
  * order (a custom SparkStrategy is not needed; the compositions below
  * are the plans a custom operator would produce anyway).
  */
object Temporal {

  /** q_asof_join — AS-OF join: each event paired with the same user's
    * most recent 'purchase' at or before it.
    *
    * Spark formulation: a running `max(CASE WHEN purchase)` window over
    * the per-user event sequence — one shuffle by user_id, one sort, no
    * join at all. This is the scale-correct as-of shape when the "right
    * side" is the same stream; for two streams, union-then-window gives
    * the same single-shuffle plan (vs. the naive range join's quadratic
    * blowup).
    */
  val qAsofJoin = Q(
    "q_asof_join",
    (s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables
        .events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          max(when(col("event_type") === "purchase", col("event_id")))
            .over(w)
            .as("asof_purchase_id")
        )
        .orderBy("user_id", "event_id")
    },
    Some(
      """SELECT user_id, event_id, event_type,
        |  max(CASE WHEN event_type = 'purchase' THEN event_id END)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS asof_purchase_id
        |FROM events ORDER BY user_id, event_id""".stripMargin
    )
  )

  /** q_range_join — range join via bucketing: for each 'error' event,
    * count the same user's events in the following 5 minutes.
    *
    * The naive formulation is a θ-join (quadratic). The scale shape:
    * equi-join on (user, coarse time bucket) with each probe checking
    * its own and the next bucket, then an exact range filter — the
    * bucket key turns the θ-join into a hash join whose build side is
    * bounded per bucket.
    */
  val qRangeJoin = Q(
    "q_range_join",
    (s, d) => {
      val ev = Tables
        .events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us")
        )
      val bucket = (c: org.apache.spark.sql.Column) => floor(c / lit(300000000L))
      val errors = ev
        .filter(col("event_type") === "error")
        .select(
          col("user_id").as("e_user"),
          col("event_id").as("e_id"),
          col("us").as("e_us"))
      // probe both candidate buckets of each error
      val probes = errors
        .withColumn("bkt", explode(array(bucket(col("e_us")), bucket(col("e_us")) + 1)))
      val candidates = ev.withColumn("bkt", bucket(col("us")))
      probes
        .join(candidates,
          col("e_user") === col("user_id") && probes("bkt") === candidates("bkt"))
        .filter(col("us") > col("e_us") && col("us") <= col("e_us") + lit(300000000L))
        .groupBy(col("e_user").as("user_id2"), col("e_id"))
        .agg(count(lit(1)).as("n_following"))
        .select(col("user_id2").as("user_id"), col("e_id"), col("n_following"))
        .orderBy("user_id", "e_id")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |err AS (
        |  SELECT user_id AS e_user, event_id AS e_id, us AS e_us
        |  FROM ev WHERE event_type = 'error')
        |SELECT e.e_user AS user_id, e.e_id, count(*) AS n_following
        |FROM err e JOIN ev c
        |  ON c.user_id = e.e_user
        |  AND c.us > e.e_us AND c.us <= e.e_us + 300000000
        |GROUP BY 1, 2 ORDER BY user_id, e_id""".stripMargin
    )
  )

  /** q_pivot — PIVOT: event counts and exact value sums per user across
    * event types as columns. Spark `pivot` ↔ oracle conditional
    * aggregation (the plan Spark generates is the same shape).
    */
  val qPivot = Q(
    "q_pivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables
        .events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .withColumnsRenamed(types.map(t => t -> s"n_$t").toMap)
        .orderBy("user_id")
    },
    Some(
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    )
  )

  /** q_asof_join_custom — the custom AsofJoin operator (LogicalPlan +
    * Strategy + merge SparkPlan, graft.plans): every event joined to the
    * same user's latest purchase at-or-before it, as a true two-sided
    * join rather than the window composition. Oracle: the window
    * formulation, which defines identical semantics.
    */
  val qAsofJoinCustom = Q(
    "q_asof_join_custom",
    (s, d) => {
      val left = Tables
        .events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val right = Tables
        .events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_event_id"))
      graft.plans.AsofJoinOps
        .asofJoin(left, right, "user_id", "p_user", "event_id", "p_event_id")
        .select("user_id", "event_id", "p_event_id")
        .orderBy("user_id", "event_id")
    },
    Some(
      """SELECT user_id, event_id,
        |  max(CASE WHEN event_type = 'purchase' THEN event_id END)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS p_event_id
        |FROM events ORDER BY user_id, event_id""".stripMargin
    )
  )

  /** q_interval_join — interval-OVERLAP self-join (both sides are
    * spans, not points): each order opens a 7-day fulfillment window;
    * emit same-customer order pairs whose windows overlap
    * (`a.start < b.end AND b.start < a.end`). The banded-join pattern
    * for it: each interval explodes to the (≤2) week buckets it
    * covers, candidates pair inside (customer, bucket), the exact
    * overlap predicate filters, and DISTINCT collapses pairs that met
    * in two buckets.
    *
    * 100 TB shape: the cross product is bounded per (customer, week)
    * cell — never all-pairs; bucket width ≈ interval length keeps the
    * per-interval bucket fan-out at ~2 rows.
    */
  val qIntervalJoin = Q(
    "q_interval_join",
    (s, d) => {
      val week = 7L * 86400L * 1000000L
      val iv = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("st"))
        .withColumn("en", col("st") + lit(week))
      // no distinct here: length == bucket width, so the two bucket
      // values always differ by exactly 1 and orderkeys are unique —
      // the only real dedup is the final pair-level one
      val bucketed = iv.withColumn("bkt",
        explode(array(floor(col("st") / week), floor(col("en") / week))))
      val a = bucketed.select(col("o_custkey"), col("bkt"),
        col("o_orderkey").as("okey_a"), col("st").as("st_a"),
        col("en").as("en_a"))
      val b = bucketed.select(col("o_custkey"), col("bkt"),
        col("o_orderkey").as("okey_b"), col("st").as("st_b"),
        col("en").as("en_b"))
      a.join(b, Seq("o_custkey", "bkt"))
        .filter(col("okey_a") < col("okey_b") &&
          col("st_a") < col("en_b") && col("st_b") < col("en_a"))
        .select(col("o_custkey"), col("okey_a"), col("okey_b"))
        .distinct()
        .orderBy("o_custkey", "okey_a", "okey_b")
    },
    Some(
      """WITH iv AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS st,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) + 604800000000 AS en
        |  FROM orders),
        |bucketed AS (
        |  SELECT o_custkey, o_orderkey, st, en, b.bkt
        |  FROM iv, LATERAL (SELECT unnest(ARRAY[
        |    CAST(floor(st / 604800000000) AS BIGINT),
        |    CAST(floor(en / 604800000000) AS BIGINT)]) AS bkt) b)
        |SELECT DISTINCT a.o_custkey AS o_custkey,
        |  a.o_orderkey AS okey_a, b.o_orderkey AS okey_b
        |FROM bucketed a JOIN bucketed b
        |  ON a.o_custkey = b.o_custkey AND a.bkt = b.bkt
        | AND a.o_orderkey < b.o_orderkey
        | AND a.st < b.en AND b.st < a.en
        |ORDER BY o_custkey, okey_a, okey_b""".stripMargin
    )
  )

  /** q_scd2_history — slowly-changing-dimension type-2 build: collapse
    * each user's event-type timeline into validity intervals
    * [valid_from, valid_to) with an is_current flag — consecutive
    * same-state events merge into one interval; a state change closes
    * the previous interval at the new one's start. The standard way a
    * warehouse tracks attribute history, built here from the raw event
    * log in two windows (lag to find run starts, lead to close
    * intervals), both partitioned by user — state per key is one row,
    * never the corpus, and the shuffle key is user_id.
    */
  val qScd2History = Q(
    "q_scd2_history",
    (s, d) => {
      val raw = Tables.eventsRaw(s, d)
      val ev = raw
        .select(col("user_id"), col("event_id"), col("event_type"),
          Tables.tsMicros(raw).as("us"))
      val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
      val starts = ev
        .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("event_type").as("state"),
          col("us").as("valid_from_us"), col("event_id"))
      val wRun = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
      starts
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
        .select(col("user_id"), col("state"), col("valid_from_us"),
          col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
        // valid_to_us breaks ties when two runs of the same state start
        // in the same microsecond (ts is ns-resolution; `div 1000`
        // collides) — without it the sort key is not total and the
        // driver's ordered hash can flip. NULLs-first matches Spark's
        // ASC default; the oracle pins NULLS FIRST explicitly because
        // DuckDB defaults to NULLS LAST.
        .orderBy(col("user_id"), col("valid_from_us"), col("state"),
          col("valid_to_us").asc_nulls_first)
    },
    Some(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |o AS (
        |  SELECT user_id, event_id, event_type, us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev
        |  FROM e),
        |starts AS (
        |  SELECT user_id, event_type AS state, us AS valid_from_us, event_id
        |  FROM o WHERE prev IS NULL OR prev <> event_type),
        |h AS (
        |  SELECT user_id, state, valid_from_us,
        |    lead(valid_from_us) OVER (PARTITION BY user_id
        |      ORDER BY valid_from_us, event_id) AS valid_to_us
        |  FROM starts)
        |SELECT user_id, state, valid_from_us, valid_to_us,
        |  (valid_to_us IS NULL) AS is_current
        |FROM h ORDER BY user_id, valid_from_us, state,
        |  valid_to_us NULLS FIRST""".stripMargin
    )
  )

  /** q_seasonal — seasonal-naive decomposition of the daily revenue
    * series: per ISO weekday, the exact LOWER MEDIAN of daily totals
    * is the seasonal baseline (median, not mean — robust to the very
    * outlier days the query exists to surface), and the top-10 days
    * by |residual| are the anomalies AFTER seasonality is removed —
    * the day-of-week-aware alert a pipeline puts on ingest volume
    * (a quiet Sunday is normal; a quiet Tuesday is an incident).
    * All-integer: totals in cents, weekday via Spark `weekday()+1` ≡
    * DuckDB `isodow()` (both 1 = Monday), lower-median by
    * rank = (m+1) div 2.
    *
    * 100 TB shape: one partial-aggregated groupBy(day) reduces the
    * corpus to O(#days) rows; the per-weekday median window is over
    * #days/7 rows — bounded by the CALENDAR, not the data (more
    * volume means heavier days, not more of them) — and the baseline
    * joins back via broadcast (7 rows).
    */
  val qSeasonal = Q(
    "q_seasonal",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        .groupBy("day").agg(sum(col("cents")).as("total_cents"))
        .withColumn("wd", (weekday(col("day")) + 1).cast("long"))
      val wWd = Window.partitionBy("wd").orderBy("total_cents", "day")
      val med = daily
        .withColumn("rn", row_number().over(wWd))
        .withColumn("m", count(lit(1)).over(Window.partitionBy("wd")))
        .filter(col("rn") === expr("(m + 1) div 2"))
        .select(col("wd"), col("total_cents").as("wd_median_cents"))
      daily.join(broadcast(med), "wd")
        .select(col("day"), col("wd"), col("total_cents"),
          col("wd_median_cents"),
          (col("total_cents") - col("wd_median_cents")).as("residual_cents"))
        .orderBy(abs(col("residual_cents")).desc, col("day"))
        .limit(10)
    },
    Some(
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS total_cents
        |  FROM events GROUP BY 1),
        |wdd AS (
        |  SELECT day, total_cents, CAST(isodow(day) AS BIGINT) AS wd
        |  FROM daily),
        |med AS (
        |  SELECT wd, total_cents AS wd_median_cents FROM (
        |    SELECT wd, total_cents,
        |      row_number() OVER (PARTITION BY wd
        |        ORDER BY total_cents, day) AS rn,
        |      count(*) OVER (PARTITION BY wd) AS m
        |    FROM wdd)
        |  WHERE rn = (m + 1) // 2)
        |SELECT day, wd, total_cents, wd_median_cents,
        |  total_cents - wd_median_cents AS residual_cents
        |FROM wdd JOIN med USING (wd)
        |ORDER BY abs(total_cents - wd_median_cents) DESC, day
        |LIMIT 10""".stripMargin
    )
  )

  val all: Seq[Q] =
    Seq(qAsofJoin, qRangeJoin, qPivot, qAsofJoinCustom, qIntervalJoin,
      qScd2History, qSeasonal)
}
