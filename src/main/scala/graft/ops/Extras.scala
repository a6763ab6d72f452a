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

  /** q_dedup_canonical — exact dedup after normalization: dedup keys on
    * the canonical hash, catching case/punctuation/whitespace variants
    * that raw-byte hashing misses.
    */
  val qDedupCanonical = Q(
    "q_dedup_canonical",
    (s, d) => {
      val canon = trim(
        regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "),
          "\\s+", " "))
      Tables
        .documents(s, d)
        .groupBy(md5(canon).as("canon_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"))
        .orderBy("keep_id")
    },
    Some(
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS canon_hash,
        |  min(doc_id) AS keep_id, count(*) AS n_variants
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin
    )
  )

  /** q_corpus_summary — the dataset-card numbers in one row: doc count,
    * token totals, exact average quality, language count, char totals.
    */
  val qCorpusSummary = Q(
    "q_corpus_summary",
    (s, d) => {
      val toks = TextOps.qTokenCount.fn(s, d).select(col("doc_id"), col("n_tokens"))
      val qual = TextOps.qQualityScore.fn(s, d).select(col("doc_id"), col("quality"))
      Tables
        .documents(s, d)
        .join(toks, Seq("doc_id"))
        .join(qual, Seq("doc_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          (sum(col("quality").cast("decimal(18,12)")).cast("double") /
            count(lit(1))).as("avg_quality")
        )
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS alpha_ratio,
        |    CAST(length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS ws_ratio,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |         x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE)
        |      / greatest(len(list_filter(string_split_regex(text, '\s+'),
        |         x -> x <> '')), 1) AS stop_ratio,
        |    least(1.0, CAST(length(text) AS DOUBLE) / 500.0) AS len_sat
        |  FROM documents)
        |SELECT count(*) AS n_docs,
        |  CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(SUM(CAST(alpha_ratio * 0.4 + (1.0 - ws_ratio) * 0.2
        |    + stop_ratio * 0.2 + len_sat * 0.2 AS DECIMAL(18,12))) AS DOUBLE)
        |    / count(*) AS avg_quality
        |FROM documents JOIN t USING (doc_id)""".stripMargin
    )
  )

  /** q_funnel — ordered-sequence funnel per user: signup followed later
    * by a purchase (classic product-analytics sequence matching via
    * conditional min aggregates; no self-join).
    */
  val qFunnel = Q(
    "q_funnel",
    (s, d) =>
      Tables
        .events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("event_id"))).as("first_signup"),
          max(when(col("event_type") === "purchase", col("event_id"))).as("last_purchase")
        )
        .select(
          col("user_id"),
          col("first_signup").isNotNull.as("did_signup"),
          (col("first_signup").isNotNull && col("last_purchase").isNotNull &&
            col("last_purchase") > col("first_signup")).as("converted")
        )
        .groupBy("did_signup", "converted")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("did_signup", "converted"),
    Some(
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN event_id END) AS first_signup,
        |    max(CASE WHEN event_type = 'purchase' THEN event_id END) AS last_purchase
        |  FROM events GROUP BY user_id)
        |SELECT (first_signup IS NOT NULL) AS did_signup,
        |  (first_signup IS NOT NULL AND last_purchase IS NOT NULL
        |    AND last_purchase > first_signup) AS converted,
        |  count(*) AS n_users
        |FROM f GROUP BY 1, 2 ORDER BY did_signup, converted""".stripMargin
    )
  )

  /** q_full_outer_join — FULL OUTER over distinct key sets with side
    * flags (which nations have customers/suppliers/both).
    */
  val qFullOuterJoin = Q(
    "q_full_outer_join",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("ck")).distinct()
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("sk")).distinct()
      c.join(sup, col("ck") === col("sk"), "full_outer")
        .select(
          coalesce(col("ck"), col("sk")).as("nk"),
          col("ck").isNotNull.as("has_cust"),
          col("sk").isNotNull.as("has_supp"))
        .orderBy("nk")
    },
    Some(
      """SELECT coalesce(ck, sk) AS nk,
        |  ck IS NOT NULL AS has_cust, sk IS NOT NULL AS has_supp
        |FROM (SELECT DISTINCT c_nationkey AS ck FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS sk FROM supplier) s
        |  ON ck = sk
        |ORDER BY nk""".stripMargin
    )
  )

  /** q_right_outer_join — RIGHT OUTER: all nations, even supplier-less. */
  val qRightOuterJoin = Q(
    "q_right_outer_join",
    (s, d) => {
      val sup = Tables.supplier(s, d)
      val n   = Tables.nation(s, d)
      sup
        .join(n, sup("s_nationkey") === n("n_nationkey"), "right_outer")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_supp"))
        .orderBy("n_name")
    },
    Some(
      """SELECT n_name, count(s_suppkey) AS n_supp
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
    )
  )

  /** q_union_by_name — schema-aligned union with missing columns filled
    * NULL (unionByName ↔ UNION ALL BY NAME).
    */
  val qUnionByName = Q(
    "q_union_by_name",
    (s, d) => {
      val a = Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
      val b = Tables.supplier(s, d)
        .select(col("s_name").as("name"), col("s_suppkey").as("id"))
      a.unionByName(b.withColumn("bal", lit(null).cast("double")))
        .orderBy(col("name"), col("id"))
    },
    Some(
      """SELECT id, name, bal FROM (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
        |  UNION ALL BY NAME
        |  SELECT s_name AS name, s_suppkey AS id, NULL::DOUBLE AS bal FROM supplier) t
        |ORDER BY name, id""".stripMargin
    )
  )

  /** q_multi_distinct — several DISTINCT aggregates per group alongside
    * plain ones (plans through Spark's Expand-based distinct rewrite).
    */
  val qMultiDistinct = Q(
    "q_multi_distinct",
    (s, d) =>
      Tables
        .lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qHistogram, qCrossJoin, qModePerGroup,
    qDedupCanonical, qCorpusSummary, qFunnel,
    qFullOuterJoin, qRightOuterJoin, qUnionByName, qMultiDistinct)
}
