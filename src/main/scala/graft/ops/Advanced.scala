package graft.ops

import graft.{Q, Tables}
import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

/** Follow-on operators composing earlier machinery: the typed top-k
  * aggregator as a query, late materialization over plain parquet, and
  * the end-to-end dedup keep/drop decision.
  */
object Advanced {

  /** q_topk_per_group — the TopKAggregator (typed UDAF) as a query:
    * top-3 order prices per customer, exploded to rows. Partial
    * aggregation ships ≤3 values per task per group.
    */
  val qTopkPerGroup = Q(
    "q_topk_per_group",
    (s, d) => {
      import s.implicits._
      val topk = new TopKAggregator(3).toColumn
      Tables
        .orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(topk.name("top3"))
        .toDF("o_custkey", "top3")
        .select(col("o_custkey"), posexplode(col("top3")).as(Seq("rk", "price")))
        .select(col("o_custkey"), (col("rk") + 1).as("rk"), col("price"))
        .orderBy("o_custkey", "rk")
    },
    Some(
      """SELECT o_custkey, CAST(rk AS INT) AS rk, price
        |FROM (
        |  SELECT o_custkey, o_totalprice AS price,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin
    )
  )

  /** q_latemat_parquet — late materialization (A10) generalized to any
    * parquet table via the stable `_metadata.row_index` row identity:
    * narrow scan (sort keys + row id) → filter/sort/limit → re-join the
    * ≤k survivors against the wide scan. At 100 TB the narrow scan
    * reads 3 of 11 columns; the wide read touches ≤k rows.
    */
  val qLatematParquet = Q(
    "q_latemat_parquet",
    (s, d) => {
      val path = s"$d/lineitem.parquet"
      def scan = s.read.parquet(path)
      val narrow = scan
        .select(
          col("l_shipdate"),
          col("l_orderkey"),
          col("l_linenumber"),
          col("_metadata.file_path").as("__f"),
          col("_metadata.row_index").as("__ri"))
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .orderBy(col("l_shipdate").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(5)
        .select(col("__f"), col("__ri"))
      val wide = scan.select(
        col("*"),
        col("_metadata.file_path").as("__f"),
        col("_metadata.row_index").as("__ri"))
      narrow
        .join(wide, Seq("__f", "__ri"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity",
          "l_extendedprice", "l_returnflag")
        .orderBy(col("l_shipdate").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    },
    Some(
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |  l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
        |ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 5""".stripMargin
    )
  )

  /** q_dedup_decision — the end-to-end dedup verdict: every document
    * marked keep/drop, where a doc is dropped iff it belongs to a
    * near-dup cluster and is not the cluster representative (smallest
    * doc_id). Composes LSH pairs → connected components → anti-join.
    */
  val qDedupDecision = Q(
    "q_dedup_decision",
    (s, d) => {
      val clusters = Dedup.qDedupClusters
        .fn(s, d)
        .select(col("doc_id"), col("component_id"))
      Tables
        .documents(s, d)
        .select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .select(
          col("doc_id"),
          (col("component_id").isNull || col("component_id") === col("doc_id"))
            .as("keep")
        )
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE pairs AS (${Dedup.lshPairsSql}),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src AS node, src AS r FROM edges
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
         |),
         |comp AS (
         |  SELECT node AS doc_id, min(r) AS component_id
         |  FROM reach GROUP BY node)
         |SELECT d.doc_id,
         |  (c.component_id IS NULL OR c.component_id = d.doc_id) AS keep
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
         |ORDER BY d.doc_id""".stripMargin
    )
  )

  /** q_pagerank — damped PageRank over the customer↔supplier purchase
    * graph (distinct (customer, supplier) pairs from orders⋈lineitem,
    * both directions, node ids disambiguated as 2·custkey / 2·suppkey+1),
    * 5 fixed iterations.
    *
    * Exactness: ranks are BIGINTs scaled by 1e6; each iteration is
    * rank' = 0.15·1e6 + Σ_in floor(rank·85 / (outdeg·100)) in pure
    * integer division — both engines compute identical values, no
    * float ever decides anything. The oracle unrolls the 5 iterations
    * as chained CTEs (standard SQL allows no aggregate in a recursive
    * term).
    *
    * 100 TB shape: per iteration one join of the rank vector to the
    * edge list (both keyed by src — co-partitioned after the first
    * exchange) and one partial-aggregated sum by dst; the driver holds
    * nothing; `localCheckpoint` caps lineage across iterations exactly
    * like the connected-components loop. Fixed iteration count (the
    * production norm) means no convergence collect round-trips at all.
    */
  val qPagerank = Q(
    "q_pagerank",
    (s, d) => {
      val pairs = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs
        .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val nodes = edges.select(col("src").as("node")).distinct()
        .localCheckpoint()
      var rank = nodes.withColumn("r", lit(1000000L))
      for (_ <- 1 to 5) {
        val contrib = edges
          .join(rank, col("src") === col("node"))
          .join(outdeg, "src")
          .select(col("dst").as("node"),
            expr("(r * 85) div (deg * 100)").as("c"))
          .groupBy("node")
          .agg(sum(col("c")).as("in_c"))
        rank = nodes
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("in_c"), lit(0L))).as("r"))
          .localCheckpoint()
      }
      rank.select(col("node"), col("r").as("rank"))
        .orderBy(desc("rank"), col("node"))
    },
    Some {
      val iters = (1 to 5).map { k =>
        s"""r$k AS (
           |  SELECT n.node,
           |    CAST(150000 + coalesce(sum((p.r * 85) // (o.deg * 100)), 0)
           |      AS BIGINT) AS r
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN r${k - 1} p ON p.node = e.src
           |  LEFT JOIN outdeg o ON o.src = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT src, dst FROM pairs
         |  UNION ALL SELECT dst, src FROM pairs),
         |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |$iters
         |SELECT node, r AS rank FROM r5
         |ORDER BY rank DESC, node""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(qTopkPerGroup, qLatematParquet, qDedupDecision,
    qPagerank)
}
