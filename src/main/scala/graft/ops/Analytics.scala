package graft.ops

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-analytics surface beyond the reference's own queries (SURVEY.md
  * §2 scoped these out of the reference; the builder brief asks for a
  * complete engine, so they are first-class here): window functions,
  * grouping sets, set operations, semi/anti joins, scalar subqueries,
  * date and JSON functions.
  */
object Analytics {

  /** q_window_rank — ranking window functions: latest-2 orders per
    * customer with row_number/rank/dense_rank.
    */
  val qWindowRank = Q(
    "q_window_rank",
    (s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      Tables
        .orders(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk")
        )
        .filter(col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    },
    Some(
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn,
        |  CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate DESC, o_orderkey ASC)) t
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin
    ),
    bench = true
  )

  /** q_window_running — running aggregate + lag over a per-user event
    * sequence (ordered by the unique event_id so both engines agree on
    * frame order; decimal-exact running sum).
    */
  val qWindowRunning = Q(
    "q_window_running",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables
        .events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          sum(Exact.dec(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .as("running_value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type")
        )
        .orderBy("user_id", "event_id")
    },
    Some(
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events ORDER BY user_id, event_id""".stripMargin
    )
  )

  /** q_range_frame — a VALUE-based window frame (RANGE BETWEEN 3600
    * PRECEDING AND CURRENT ROW over epoch seconds): each event's
    * trailing-one-hour spend and event count per user — the rate-limit
    * / velocity-check shape (fraud scoring, burst detection) that ROWS
    * frames get WRONG when events cluster (a ROWS-10 frame spans
    * minutes or days depending on density; the RANGE frame is defined
    * by TIME). Exercises the one frame type no other registry window
    * uses. RANGE semantics also make ties a non-issue: all peer rows
    * with the same ordering value share one frame, so the result is
    * deterministic without a unique tiebreak column.
    *
    * 100 TB shape: one shuffle by user_id, per-user ordered frames —
    * the partition key is the data-scale key (millions of users), so
    * no under-partitioned window; cents are exact BIGINT.
    */
  val qRangeFrame = Q(
    "q_range_frame",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("secs")
        .rangeBetween(-3600, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("secs"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        .select(col("user_id"), col("event_id"),
          sum(col("cents")).over(w).as("hr_sum_cents"),
          count(lit(1)).over(w).as("hr_n"))
        .orderBy("user_id", "event_id")
    },
    Some(
      """SELECT user_id, event_id,
        |  CAST(sum(cents) OVER w AS BIGINT) AS hr_sum_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS hr_n
        |FROM (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS secs,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY secs
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
    )
  )

  /** q_rollup — hierarchical grouping with subtotals + GROUPING flags. */
  val qRollup = Q(
    "q_rollup",
    (s, d) =>
      Tables
        .lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls")
        )
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first
        ),
    Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin
    )
  )

  /** q_cube — full cross-dimensional subtotals. */
  val qCube = Q(
    "q_cube",
    (s, d) =>
      Tables
        .orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("total"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first
        ),
    Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
    )
  )

  /** q_intersect — INTERSECT (distinct semantics in both engines). */
  val qIntersect = Q(
    "q_intersect",
    (s, d) =>
      Tables
        .customer(s, d)
        .select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey")))
        .orderBy("nk"),
    Some(
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin
    )
  )

  /** q_except — EXCEPT (distinct semantics in both engines). */
  val qExcept = Q(
    "q_except",
    (s, d) =>
      Tables
        .customer(s, d)
        .select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey")))
        .orderBy("nk"),
    Some(
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin
    )
  )

  /** q_semi_join — EXISTS as left-semi join (no right-side columns, no
    * row duplication; at scale the orders side is aggregated into a
    * bloom/broadcast by Catalyst where sizes allow).
    */
  val qSemiJoin = Q(
    "q_semi_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    )
  )

  /** q_anti_join — NOT EXISTS as left-anti join. */
  val qAntiJoin = Q(
    "q_anti_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    )
  )

  /** q_outer_join — left outer join with null-producing side surfaced. */
  val qOuterJoin = Q(
    "q_outer_join",
    (s, d) => {
      val n = Tables.nation(s, d)
      val s2 = Tables.supplier(s, d)
      n.join(s2, n("n_nationkey") === s2("s_nationkey"), "left_outer")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_supp"))
        .orderBy("n_name")
    },
    Some(
      """SELECT n_name, count(s_suppkey) AS n_supp
        |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
    )
  )

  /** q_having — post-aggregation filter. */
  val qHaving = Q(
    "q_having",
    (s, d) =>
      Tables
        .orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey"),
    Some(
      """SELECT o_custkey, count(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin
    )
  )

  /** q_scalar_subquery — filter against a computed scalar (broadcast of
    * a 1-row aggregate, not a driver collect).
    */
  val qScalarSubquery = Q(
    "q_scalar_subquery",
    (s, d) => {
      val o = Tables.orders(s, d)
      val avgPrice = o.agg(
        (Exact.dsum(col("o_totalprice")) / count(lit(1))).as("avg_price")
      )
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin
    )
  )

  /** q_date_funcs — calendar extraction, truncation, day arithmetic. */
  val qDateFuncs = Q(
    "q_date_funcs",
    (s, d) =>
      Tables
        .orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since")
        )
        .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin
    )
  )

  /** q_date_funcs2 — calendar-arithmetic complement: month-end, ISO
    * week/day-of-week, quarter, day/month offsets with end-of-month
    * clamping. (Spark `weekday`+1 ≡ DuckDB `isodow`; plain `dayofweek`
    * disagrees across engines on the week start.)
    */
  val qDateFuncs2 = Q(
    "q_date_funcs2",
    (s, d) =>
      Tables
        .orders(s, d)
        .select(
          col("o_orderkey"),
          // date-valued results surface as timestamp_ntz: the compare
          // canonicalizes timestamps but not raw DATE objects
          last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end"),
          quarter(col("o_orderdate")).as("qtr"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          expr("weekday(o_orderdate) + 1").as("iso_dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          date_add(col("o_orderdate"), 30).cast("timestamp_ntz").as("plus_30d"),
          add_months(col("o_orderdate"), 1).cast("timestamp_ntz").as("plus_1mo")
        )
        .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  -- DATE + 30, not "+ INTERVAL 30 DAY": DuckDB 1.0 collapses two
        |  -- same-shaped t + INTERVAL casts in one SELECT to one value
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus_30d,
        |  CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS plus_1mo
        |FROM orders ORDER BY o_orderkey""".stripMargin
    )
  )

  /** q_json_extract — JSON field extraction from the events props blob. */
  val qJsonExtract = Q(
    "q_json_extract",
    (s, d) =>
      Tables
        .events(s, d)
        .select(
          get_json_object(col("props"), "$.k").cast("int").as("k_val")
        )
        .groupBy("k_val")
        .agg(count(lit(1)).as("n"))
        .orderBy("k_val"),
    Some(
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k_val""".stripMargin
    )
  )

  /** q_math_funcs — numeric scalar functions (abs/round/pow/log/mod). */
  val qMathFuncs = Q(
    "q_math_funcs",
    (s, d) =>
      Tables
        .part(s, d)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("size_dev"),
          pmod(col("p_partkey"), lit(7)).as("bucket7"),
          floor(log(2.0, col("p_size").cast("double") + 1)).cast("long").as("log2_size"),
          pow(col("p_size").cast("double"), 2).as("size_sq"),
          round(col("p_retailprice") / 100.0, 0).as("price_h")
        )
        .orderBy("p_partkey"),
    Some(
      """SELECT p_partkey,
        |  abs(p_size - 25) AS size_dev,
        |  p_partkey % 7 AS bucket7,
        |  CAST(floor(ln(CAST(p_size AS DOUBLE) + 1) / ln(2.0)) AS BIGINT) AS log2_size,
        |  pow(CAST(p_size AS DOUBLE), 2) AS size_sq,
        |  round(p_retailprice / 100.0, 0) AS price_h
        |FROM part ORDER BY p_partkey""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(
    qWindowRank,
    qWindowRunning,
    qRangeFrame,
    qRollup,
    qCube,
    qIntersect,
    qExcept,
    qSemiJoin,
    qAntiJoin,
    qOuterJoin,
    qHaving,
    qScalarSubquery,
    qDateFuncs,
    qDateFuncs2,
    qJsonExtract,
    qMathFuncs,
    qItemsets
  )

  /** q_itemsets — frequent-pair mining over order baskets (A-priori
    * level 2 / market-basket co-occurrence): the pairs of parts bought
    * together in ≥ 2 orders, with the lift of each pair over item
    * independence (n_pair·N_baskets / (n_a·n_b), as exact ppm). The
    * basket-itemset shape complements q_pmi_cooccur's token-window
    * co-occurrence — co-purchase, not co-location. Top-50 by support
    * with full key tie-breaks.
    *
    * 100 TB shape: pair generation is a self-equi-join on the basket
    * key — pairs materialize only within an order (basket size ≤ 7
    * lines in this schema, so ≤ 21 pairs per basket, linear in the
    * corpus) and partial-aggregate before the (pa, pb) shuffle; the
    * support filter then bounds the lift join's left side, and the
    * per-item counts are a parts-vocabulary-sized table.
    */
  /** Pair supports over an arbitrary basket table `basket(ok, pk)` —
    * factored out for PropertySpec's random-basket brute-force check.
    */
  private[graft] def pairSupports(basket: org.apache.spark.sql.DataFrame,
      minSupport: Long): org.apache.spark.sql.DataFrame =
    basket.select(col("ok"), col("pk").as("pa"))
      .join(basket.select(col("ok"), col("pk").as("pb")), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)

  lazy val qItemsets: Q = Q(
    "q_itemsets",
    (s, d) => {
      val basket = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val nBaskets = basket.agg(
        countDistinct(col("ok")).as("n_baskets"))
      val itemCnt = basket.groupBy("pk")
        .agg(count(lit(1)).as("n_item"))
      val pairs = pairSupports(basket, 2L)
      pairs
        .join(broadcast(itemCnt.withColumnRenamed("pk", "pa")
          .withColumnRenamed("n_item", "n_a")), "pa")
        .join(broadcast(itemCnt.withColumnRenamed("pk", "pb")
          .withColumnRenamed("n_item", "n_b")), "pb")
        .crossJoin(broadcast(nBaskets))
        .select(col("pa"), col("pb"), col("n_pair"),
          expr("n_pair * n_baskets * 1000000L div (n_a * n_b)")
            .as("lift_ppm"))
        .orderBy(col("n_pair").desc, col("pa"), col("pb"))
        .limit(50)
    },
    Some(
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM b),
        |ic AS (SELECT pk, count(*) AS n_item FROM b GROUP BY 1),
        |p AS (
        |  SELECT a.pk AS pa, c.pk AS pb, count(*) AS n_pair
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, n_pair,
        |  CAST(n_pair * (SELECT n_baskets FROM nb) * 1000000
        |    // (ia.n_item * ib.n_item) AS BIGINT) AS lift_ppm
        |FROM p
        |JOIN ic ia ON ia.pk = p.pa
        |JOIN ic ib ON ib.pk = p.pb
        |ORDER BY n_pair DESC, pa, pb LIMIT 50""".stripMargin
    )
  )
}
