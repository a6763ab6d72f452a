package graft.ops

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function and predicate surface (completeness batch): string
  * manipulation, null handling, IN/BETWEEN, casts, grouping sets,
  * approximate aggregates. All map-side/scan-bound except the grouped
  * aggregates.
  */
object Scalars {

  /** q_string_funcs2 — trim/pad/replace/split_part/reverse/position. */
  val qStringFuncs2 = Q(
    "q_string_funcs2",
    (s, d) =>
      Tables
        .part(s, d)
        .select(
          col("p_partkey"),
          trim(col("p_name")).as("trimmed"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          regexp_replace(col("p_name"), "a", "@").as("replaced"),
          split(col("p_type"), " ").getItem(0).as("type_word1"),
          reverse(col("p_brand")).as("rev_brand"),
          instr(col("p_name"), "e").as("first_e"),
          repeat(col("p_brand"), 2).as("doubled")
        )
        .orderBy("p_partkey"),
    Some(
      """SELECT p_partkey,
        |  trim(p_name) AS trimmed,
        |  lpad(p_brand, 12, '*') AS padded,
        |  regexp_replace(p_name, 'a', '@', 'g') AS replaced,
        |  string_split(p_type, ' ')[1] AS type_word1,
        |  reverse(p_brand) AS rev_brand,
        |  CAST(strpos(p_name, 'e') AS INT) AS first_e,
        |  repeat(p_brand, 2) AS doubled
        |FROM part ORDER BY p_partkey""".stripMargin
    )
  )

  /** q_string_funcs3 — translate/rpad/left/right/split_part/ascii/chr
    * (the complement of q_string_funcs2's batch). split_part is the
    * SQL-function form: both engines return '' (not NULL, not an
    * error) for an out-of-range index.
    */
  val qStringFuncs3 = Q(
    "q_string_funcs3",
    (s, d) =>
      Tables
        .part(s, d)
        .select(
          col("p_partkey"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          rpad(col("p_brand"), 12, ".").as("rpadded"),
          expr("left(p_name, 4)").as("head4"),
          expr("right(p_name, 4)").as("tail4"),
          expr("split_part(p_name, ' ', 2)").as("word2"),
          ascii(col("p_type")).as("first_code"),
          expr("chr(ascii(p_type) + 1)").as("next_char")
        )
        .orderBy("p_partkey"),
    Some(
      """SELECT p_partkey,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |  rpad(p_brand, 12, '.') AS rpadded,
        |  left(p_name, 4) AS head4,
        |  right(p_name, 4) AS tail4,
        |  split_part(p_name, ' ', 2) AS word2,
        |  CAST(ascii(p_type) AS INT) AS first_code,
        |  chr(ascii(p_type) + 1) AS next_char
        |FROM part ORDER BY p_partkey""".stripMargin
    )
  )

  /** q_null_funcs — coalesce/nullif/nvl over derived NULLs. */
  val qNullFuncs = Q(
    "q_null_funcs",
    (s, d) =>
      Tables
        .orders(s, d)
        .select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_defaulted"),
          when(col("o_totalprice") > 250000, col("o_totalprice")).as("big_price"),
          coalesce(
            when(col("o_totalprice") > 250000, col("o_totalprice")),
            lit(0.0)
          ).as("big_price_or_zero")
        )
        .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_defaulted,
        |  CASE WHEN o_totalprice > 250000 THEN o_totalprice END AS big_price,
        |  coalesce(CASE WHEN o_totalprice > 250000 THEN o_totalprice END, 0.0)
        |    AS big_price_or_zero
        |FROM orders ORDER BY o_orderkey""".stripMargin
    )
  )

  /** q_in_between — IN-list and BETWEEN predicates (scan-pushable). */
  val qInBetween = Q(
    "q_in_between",
    (s, d) =>
      Tables
        .lineitem(s, d)
        .filter(
          col("l_returnflag").isin("A", "R") &&
            col("l_quantity").between(10, 20) &&
            col("l_shipdate").between(
              lit("1996-01-01").cast("timestamp"),
              lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag"),
    Some(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_quantity BETWEEN 10 AND 20
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  )

  /** q_casts — cross-type casts (int/double/string/bool round trips). */
  val qCasts = Q(
    "q_casts",
    (s, d) =>
      Tables
        .part(s, d)
        .select(
          col("p_partkey"),
          col("p_size").cast("string").as("size_str"),
          col("p_size").cast("double").as("size_dbl"),
          col("p_retailprice").cast("long").as("price_trunc"),
          (col("p_size") > 25).cast("int").as("is_big"),
          concat(lit("k"), col("p_partkey").cast("string")).as("key_str")
        )
        .orderBy("p_partkey"),
    Some(
      """SELECT p_partkey,
        |  CAST(p_size AS VARCHAR) AS size_str,
        |  CAST(p_size AS DOUBLE) AS size_dbl,
        |  CAST(trunc(p_retailprice) AS BIGINT) AS price_trunc,
        |  CAST(p_size > 25 AS INT) AS is_big,
        |  concat('k', CAST(p_partkey AS VARCHAR)) AS key_str
        |FROM part ORDER BY p_partkey""".stripMargin
    )
  )

  /** q_grouping_sets — explicit GROUPING SETS (finer than rollup/cube). */
  val qGroupingSets = Q(
    "q_grouping_sets",
    (s, d) =>
      Tables
        .orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
    )
  )

  /** q_approx_distinct — HLL approximate distinct. Sketch values differ
    * across engines, so the oracle-comparable result is (exact count,
    * approx-within-±5%-of-exact boolean) per column: both engines'
    * estimators are far inside the bound, so the rows hash-match while
    * still proving the approximate path runs.
    */
  val qApproxDistinct = Q(
    "q_approx_distinct",
    (s, d) => {
      // exact and approx MUST be separate aggregations: combined, the
      // multi-distinct rewrite hauls the partial HLL sketches (rsd
      // 0.02 ≈ 820 longs EACH) through the per-(orderkey,partkey)
      // Expand aggregate — ~1.6 KiB of registers per distinct key pair
      // in the shuffle. Split, the exact side shuffles bare keys and
      // the approx side map-combines into ONE sketch per partition;
      // the two 1-row results broadcast-join for free.
      val li = Tables.lineitem(s, d)
      val exact = li.agg(
        count_distinct(col("l_orderkey")).as("exact_orders"),
        count_distinct(col("l_partkey")).as("exact_parts"))
      val approx = li.agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
      exact
        .crossJoin(broadcast(approx))
        .select(
          col("exact_orders"),
          col("exact_parts"),
          (abs(col("ao") - col("exact_orders")) <=
            col("exact_orders") * 0.05).as("orders_within_bound"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("parts_within_bound"))
    },
    Some(
      """SELECT exact_orders, exact_parts,
        |  abs(ao - exact_orders) <= exact_orders * 0.05 AS orders_within_bound,
        |  abs(ap - exact_parts) <= exact_parts * 0.05 AS parts_within_bound
        |FROM (
        |  SELECT count(DISTINCT l_orderkey) AS exact_orders,
        |         count(DISTINCT l_partkey) AS exact_parts,
        |         approx_count_distinct(l_orderkey) AS ao,
        |         approx_count_distinct(l_partkey) AS ap
        |  FROM lineitem
        |)""".stripMargin
    )
  )

  /** q_bool_bit_aggs — boolean (every/some) and bitwise (and/or/xor)
    * aggregates, all order-independent and exact.
    */
  val qBoolBitAggs = Q(
    "q_bool_bit_aggs",
    (s, d) =>
      Tables
        .lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          every(col("l_quantity") > 0).as("all_positive"),
          some(col("l_quantity") > 45).as("any_large"),
          bit_and(col("l_linenumber")).as("ln_and"),
          bit_or(col("l_linenumber")).as("ln_or"),
          bit_xor(col("l_linenumber")).as("ln_xor")
        )
        .orderBy("l_returnflag"),
    Some(
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_quantity > 45) AS any_large,
        |  bit_and(l_linenumber) AS ln_and,
        |  bit_or(l_linenumber) AS ln_or,
        |  bit_xor(l_linenumber) AS ln_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(
    qStringFuncs2,
    qStringFuncs3,
    qNullFuncs,
    qInBetween,
    qCasts,
    qGroupingSets,
    qApproxDistinct,
    qBoolBitAggs
  )
}
