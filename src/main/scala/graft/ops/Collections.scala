package graft.ops

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.functions._

/** Collection/regex/arg-extrema surface (completeness batch). */
object Collections {

  /** q_array_funcs — array construction and navigation: contains, slice,
    * position, flattening of grouped arrays. Output scalarized for the
    * oracle compare.
    */
  val qArrayFuncs = Q(
    "q_array_funcs",
    (s, d) =>
      Tables
        .lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
        .select(
          col("l_orderkey"),
          array_contains(col("lines"), 3).as("has_line3"),
          size(slice(col("lines"), 1, 2)).as("first2"),
          array_position(col("lines"), 2).cast("int").as("pos_of_2"),
          array_max(col("lines")).as("max_line")
        )
        .orderBy("l_orderkey"),
    Some(
      """SELECT l_orderkey,
        |  list_contains(ls, 3) AS has_line3,
        |  CAST(len(ls[1:2]) AS INT) AS first2,
        |  CAST(coalesce(list_position(ls, 2), 0) AS INT) AS pos_of_2,
        |  list_max(ls) AS max_line
        |FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS ls
        |      FROM lineitem GROUP BY l_orderkey) t
        |ORDER BY l_orderkey""".stripMargin
    )
  )

  /** q_map_funcs — map construction + lookup (no MAP in the reference;
    * completeness). Maps are built per row and read back, output scalar.
    */
  val qMapFuncs = Q(
    "q_map_funcs",
    (s, d) =>
      Tables
        .orders(s, d)
        .select(
          col("o_orderkey"),
          map(
            lit("status"), col("o_orderstatus"),
            lit("priority"), col("o_orderpriority")
          ).as("m")
        )
        .select(
          col("o_orderkey"),
          col("m")("status").as("status"),
          col("m")("priority").as("priority"),
          size(col("m")).as("n_keys")
        )
        .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  m['status'][1] AS status, m['priority'][1] AS priority,
        |  CAST(cardinality(m) AS INT) AS n_keys
        |FROM (SELECT o_orderkey,
        |        MAP(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
        |      FROM orders) t
        |ORDER BY o_orderkey""".stripMargin
    )
  )

  /** q_regexp — regex extraction and matching. */
  val qRegexp = Q(
    "q_regexp",
    (s, d) =>
      Tables
        .orders(s, d)
        .select(
          col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "^(\\d)-(\\w+)", 1).as("prio_num"),
          regexp_extract(col("o_orderpriority"), "^(\\d)-(\\w+)", 2).as("prio_word"),
          col("o_orderpriority").rlike("URGENT|HIGH").as("is_hot")
        )
        .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '^(\d)-(\w+)', 1) AS prio_num,
        |  regexp_extract(o_orderpriority, '^(\d)-(\w+)', 2) AS prio_word,
        |  regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot
        |FROM orders ORDER BY o_orderkey""".stripMargin
    )
  )

  /** q_arg_extrema — min_by/max_by (arg_min/arg_max): per nation, the
    * highest-balance customer. The extremum key packs (balance-in-cents,
    * custkey) into one exact BIGINT so ties break identically in both
    * engines (DuckDB's arg_max rejects struct keys).
    */
  val qArgExtrema = Q(
    "q_arg_extrema",
    (s, d) => {
      // balances have 2 decimals; ×100 + half-up floor is exact in both
      val key = floor(col("c_acctbal") * 100 + 0.5).cast("long") * 10000000L +
        col("c_custkey")
      Tables
        .customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          max_by(col("c_custkey"), key).as("richest_cust"),
          max(col("c_acctbal")).as("top_bal")
        )
        .orderBy("c_nationkey")
    },
    Some(
      """SELECT c_nationkey,
        |  arg_max(c_custkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 10000000 + c_custkey)
        |    AS richest_cust,
        |  max(c_acctbal) AS top_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
    )
  )

  /** q_correlated_subquery — each order compared to its own customer's
    * average: the correlated scalar subquery, expressed in Spark as a
    * window aggregate (one shuffle, no rescan — the plan a decorrelation
    * rewrite produces anyway).
    */
  val qCorrelatedSubquery = Q(
    "q_correlated_subquery",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
      Tables
        .orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice"),
          (sum(Exact.dec(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("cust_avg")
        )
        .filter(col("o_totalprice") > col("cust_avg"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    },
    Some(
      """SELECT o_orderkey, o_custkey FROM orders o1
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
        |ORDER BY o_orderkey""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(
    qArrayFuncs,
    qMapFuncs,
    qRegexp,
    qArgExtrema,
    qCorrelatedSubquery
  )
}
