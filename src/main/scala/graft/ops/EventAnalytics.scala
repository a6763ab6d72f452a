package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics shapes over the events stream table. */
object EventAnalytics {

  /** q_daily_uniques — distinct active users per day. */
  val qDailyUniques = Q(
    "q_daily_uniques",
    (s, d) =>
      Tables
        .events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(countDistinct(col("user_id")).as("dau"), count(lit(1)).as("n_events"))
        .orderBy("day"),
    Some(
      """SELECT date_trunc('day', ts) AS day,
        |  count(DISTINCT user_id) AS dau, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin
    )
  )

  /** q_retention — next-day retention: of each day's active users, how
    * many are active the following day (distinct day-pairs self-join).
    */
  val qRetention = Q(
    "q_retention",
    (s, d) => {
      val active = Tables
        .events(s, d)
        .select(
          col("user_id"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .distinct()
      val next = active.select(
        col("user_id").as("u2"),
        (col("day") - expr("INTERVAL 1 DAY")).as("prev_day"))
      active
        .join(next, col("user_id") === col("u2") && col("day") === col("prev_day"), "left_outer")
        .groupBy("day")
        .agg(
          count(lit(1)).as("active"),
          count(col("u2")).as("retained"))
        .orderBy("day")
    },
    Some(
      """WITH active AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        |SELECT a.day, count(*) AS active, count(n.user_id) AS retained
        |FROM active a
        |LEFT JOIN active n
        |  ON n.user_id = a.user_id AND n.day = a.day + INTERVAL 1 DAY
        |GROUP BY a.day ORDER BY a.day""".stripMargin
    )
  )

  /** q_top_users_per_type — the 3 most active users per event type
    * (count-ranked with a deterministic tie-break).
    */
  val qTopUsersPerType = Q(
    "q_top_users_per_type",
    (s, d) => {
      val counts = Tables
        .events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n"))
      val w = Window
        .partitionBy("event_type")
        .orderBy(col("n").desc, col("user_id").asc)
      counts
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("event_type"), col("rk").cast("int").as("rk"),
          col("user_id"), col("n"))
        .orderBy("event_type", "rk")
    },
    Some(
      """SELECT event_type, CAST(rk AS INT) AS rk, user_id, n FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY count(*) DESC, user_id ASC) AS rk
        |  FROM events GROUP BY event_type, user_id) t
        |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin
    )
  )

  /** q_transitions — behavioral transition matrix: for each user's
    * event sequence (event-time order, event_id tie-break), count
    * (previous event_type → event_type) pairs across the corpus, with
    * each type's share of outgoing transitions. The Markov-chain view
    * of product flows (what follows a click?).
    *
    * 100 TB shape: one shuffle to co-locate each user's events, a lag
    * window per user (linear in the partition), then a tiny global
    * aggregate over |types|² rows — partial-aggregated, so the wire
    * carries transition counts, not events. Shares are single
    * divisions of exact counts.
    */
  val qTransitions = Q(
    "q_transitions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
      val w2 = Window.partitionBy("prev_type")
      counts
        .withColumn("share",
          col("n").cast("double") / sum(col("n")).over(w2))
        .select(col("prev_type"), col("event_type"), col("n"), col("share"))
        .orderBy("prev_type", "event_type")
    },
    Some(
      """WITH pairs AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |counts AS (
        |  SELECT prev_type, event_type, count(*) AS n
        |  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS share
        |FROM counts ORDER BY prev_type, event_type""".stripMargin
    )
  )

  /** q_cohort_matrix — the full cohort retention triangle: users
    * grouped by first-activity day, tracked as distinct actives at
    * each day offset. Generalizes q_retention's next-day pair to the
    * whole matrix.
    *
    * 100 TB shape: one aggregate to (user, day) distinct activity, one
    * to first-activity cohorts, a co-partitioned join on user, then a
    * tiny (days × offsets) count matrix — partial-aggregated
    * throughout; raw events shuffle once.
    */
  val qCohortMatrix = Q(
    "q_cohort_matrix",
    (s, d) => {
      val activity = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .distinct()
      val cohorts = activity.groupBy("user_id")
        .agg(min(col("day")).as("cohort_day"))
      activity.join(cohorts, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day").cast("date"), col("cohort_day").cast("date"))
            .as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort_day").cast("timestamp_ntz").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some(
      """WITH activity AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |cohorts AS (
        |  SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY 1)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin
    )
  )

  /** q_rfm — RFM segmentation: per user, recency (days from last
    * purchase to the corpus' last day — a deterministic anchor),
    * frequency (purchase count), monetary (exact decimal sum), each
    * quartiled by a global ntile with user_id tie-breaks.
    *
    * Scale note: each quartile is a GLOBAL exact ntile over the
    * per-user aggregate (users, not events) computed via
    * [[Distributed.globalNtile]] — range partitions + broadcast
    * offsets + a partitioned row_number — so no single task ever
    * sorts the whole frame; the event-level work before it is
    * partial-aggregated.
    */
  val qRfm = Q(
    "q_rfm",
    (s, d) => {
      val buys = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
      // corpus anchor stays in-plan: a 1-row aggregate broadcast by the
      // cross join (the oracle's scalar subquery), no driver collect
      val anchor = buys
        .agg(max(date_trunc("day", col("ts"))).as("anchor"))
      val perUser = buys.groupBy("user_id")
        .agg(
          max(date_trunc("day", col("ts"))).cast("date").as("last_day"),
          count(lit(1)).as("frequency"),
          graft.Exact.dsum(col("value")).as("monetary"))
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          datediff(col("anchor").cast("date"), col("last_day"))
            .as("recency_days"),
          col("frequency"), col("monetary"))
      // each quartile is an exact global ntile computed the distributed
      // way (range partitions + broadcast offsets + PARTITIONED
      // row_number — Distributed.globalNtile), never a single-partition
      // window; (metric, user_id) makes each sort total
      def quartile(df: org.apache.spark.sql.DataFrame, c: String,
          ascending: Boolean, out: String) = {
        val key = if (ascending) col(c).asc else col(c).desc
        Distributed.globalNtile(df, 4, Seq(key, col("user_id").asc), out)
      }
      val q3 = quartile(
        quartile(
          quartile(perUser, "recency_days", ascending = true, "r_quartile"),
          "frequency", ascending = false, "f_quartile"),
        "monetary", ascending = false, "m_quartile")
      q3.select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"), col("r_quartile"), col("f_quartile"),
          col("m_quartile"))
        .orderBy("user_id")
    },
    Some(
      """WITH buys AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, value
        |  FROM events WHERE event_type = 'purchase'),
        |per_user AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', max(day), (SELECT max(day) FROM buys)) AS INT)
        |      AS recency_days,
        |    count(*) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM buys GROUP BY 1)
        |SELECT user_id, recency_days, frequency, monetary,
        |  CAST(ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS INT)
        |    AS r_quartile,
        |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS INT)
        |    AS f_quartile,
        |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS INT)
        |    AS m_quartile
        |FROM per_user ORDER BY user_id""".stripMargin
    )
  )

  /** q_attribution — first/last-touch conversion attribution: each
    * purchase is credited to the user's first and most recent preceding
    * click within a 7-day lookback. The per-user ordered scan is one
    * window (`last_value` of click times over preceding rows) — no
    * self-join of the event stream; purchases with no in-window click
    * report null touches (kept, as unattributed conversions).
    *
    * 100 TB shape: one shuffle by user_id, then a map-side window over
    * each user's ordered events; state is one running click pair.
    */
  val qAttribution = Q(
    "q_attribution",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val clickTs = when(col("event_type") === "click", col("ts"))
      val clickId = when(col("event_type") === "click", col("event_id"))
      Tables.events(s, d)
        .withColumn("last_click_ts", last(clickTs, ignoreNulls = true).over(w))
        .withColumn("last_click_id", last(clickId, ignoreNulls = true).over(w))
        .withColumn("first_click_ts", first(clickTs, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("in_window",
          col("last_click_ts") >= col("ts") - expr("INTERVAL 7 DAY"))
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").cast("timestamp_ntz").as("purchase_ts"),
          when(col("in_window"), col("last_click_id")).as("last_touch_id"),
          when(col("in_window"), col("last_click_ts"))
            .cast("timestamp_ntz").as("last_touch_ts"),
          when(col("in_window"), col("first_click_ts"))
            .cast("timestamp_ntz").as("first_touch_ts"))
        .orderBy("user_id", "purchase_id")
    },
    Some(
      """SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |  CASE WHEN in_window THEN last_click_id END AS last_touch_id,
        |  CASE WHEN in_window THEN last_click_ts END AS last_touch_ts,
        |  CASE WHEN in_window THEN first_click_ts END AS first_touch_ts
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_click_ts >= ts - INTERVAL 7 DAY AS in_window,
        |    last_click_ts, last_click_id, first_click_ts
        |  FROM (
        |    SELECT user_id, event_id, ts, event_type,
        |      last_value(CASE WHEN event_type = 'click' THEN ts END
        |        IGNORE NULLS) OVER w AS last_click_ts,
        |      last_value(CASE WHEN event_type = 'click' THEN event_id END
        |        IGNORE NULLS) OVER w AS last_click_id,
        |      first_value(CASE WHEN event_type = 'click' THEN ts END
        |        IGNORE NULLS) OVER w AS first_click_ts
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)))
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin
    )
  )

  /** q_window_funnel — TIME-CONSTRAINED ordered funnel (the
    * windowFunnel primitive product analytics engines ship natively):
    * view → click → purchase where each step must land within 72 h of
    * the PREVIOUS step, sequential-first-match semantics (step k's
    * timestamp is the earliest qualifying event after step k−1;
    * deterministic — no per-row ambiguity). Complements q_funnel,
    * which orders two steps but never constrains elapsed time. Emits
    * the per-step survivor counts and the end-to-end conversion in
    * exact ppm.
    *
    * 100 TB shape: each step is one per-user conditional min —
    * events shuffle by user_id once per step and the step frames
    * (one row per surviving user) reuse that partitioning; no event
    * self-join exists. At cluster scale the three steps fold into one
    * user-partitioned sort pass (sessionize-style); the per-step
    * aggregate form keeps the oracle exactly mirrorable.
    */
  val qWindowFunnel = Q(
    "q_window_funnel",
    (s, d) => {
      val w = 72L * 3600L * 1000000L // 72 h in µs
      val ev = graft.Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tsu"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tsu")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("tsu") > col("t1") && col("tsu") <= col("t1") + w)
        .groupBy("user_id").agg(min(col("tsu")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("tsu") > col("t2") && col("tsu") <= col("t2") + w)
        .groupBy("user_id").agg(min(col("tsu")).as("t3"))
      val nAll = ev.select("user_id").distinct()
        .agg(count(lit(1)).as("n_users"))
      val n1 = t1.agg(count(lit(1)).as("n_view"))
      val n2 = t2.agg(count(lit(1)).as("n_view_click"))
      val n3 = t3.agg(count(lit(1)).as("n_full_funnel"))
      nAll.crossJoin(n1).crossJoin(n2).crossJoin(n3)
        .select(col("n_users"), col("n_view"), col("n_view_click"),
          col("n_full_funnel"),
          expr("n_full_funnel * 1000000 div n_users").as("conv_ppm"))
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
        |t1 AS (
        |  SELECT user_id, min(tsu) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT ev.user_id, min(tsu) AS t2
        |  FROM ev JOIN t1 ON t1.user_id = ev.user_id
        |  WHERE event_type = 'click'
        |    AND tsu > t1.t1 AND tsu <= t1.t1 + 259200000000
        |  GROUP BY 1),
        |t3 AS (
        |  SELECT ev.user_id, min(tsu) AS t3
        |  FROM ev JOIN t2 ON t2.user_id = ev.user_id
        |  WHERE event_type = 'purchase'
        |    AND tsu > t2.t2 AND tsu <= t2.t2 + 259200000000
        |  GROUP BY 1)
        |SELECT
        |  (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
        |  (SELECT count(*) FROM t1) AS n_view,
        |  (SELECT count(*) FROM t2) AS n_view_click,
        |  (SELECT count(*) FROM t3) AS n_full_funnel,
        |  (SELECT count(*) FROM t3) * 1000000
        |    // (SELECT count(DISTINCT user_id) FROM ev) AS conv_ppm""".stripMargin
    )
  )

  val all: Seq[Q] =
    Seq(qDailyUniques, qRetention, qTopUsersPerType, qTransitions,
      qCohortMatrix, qRfm, qAttribution, qWindowFunnel)
}
