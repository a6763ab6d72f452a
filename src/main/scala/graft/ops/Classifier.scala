package graft.ops

import java.util.concurrent.atomic.AtomicLong

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality/domain classifier — the "train a classifier ON the
  * corpus, then filter BY it" stage every modern pretraining pipeline
  * runs (GPT-3's WebText-vs-CommonCrawl logistic filter, Brown et al.
  * 2020 Appendix A; CCNet's fastText LM routing, Wenzek et al. 2020;
  * FineWeb-Edu's scored retention). The existing q_classifier_score
  * applies FIXED weights; this family closes the other half: training
  * the weights from the corpus itself, engine-exactly.
  *
  * Model: multinomial Naive Bayes (McCallum & Nigam 1998) over
  * whitespace tokens, positive class = the curated source ('src0' —
  * the WebText stand-in), negative = everything else. NB is the one
  * mainstream text classifier whose TRAINING is closed-form counting —
  * no SGD, no float accumulation order — so the trained model is
  * bit-identical across engines:
  *
  *   llr_ppm(t) = ⌊ln((c⁺(t)+1)/(N⁺+V))·10⁶+0.5⌋
  *              − ⌊ln((c⁻(t)+1)/(N⁻+V))·10⁶+0.5⌋
  *
  * (Laplace-smoothed class-conditional log-likelihood ratio, quantized
  * to ppm — the repo's ln convention, [[Unigram]]/q_bigram_lm: every
  * input to the one double `ln` is an exact BIGINT ratio, and
  * everything after quantization is exact integer arithmetic.)
  *
  * Distribution shape (the 100 TB story):
  *  - Training is ONE corpus token pass: a partial-aggregated
  *    groupBy(token) with conditional sums — the shuffle is keyed on
  *    the Heaps-sublinear vocabulary, never on documents. The three
  *    scalars (N⁺, N⁻, V) ride a broadcast 1-row cross join.
  *  - The model is vocabulary-sized; scoring broadcast-joins it to the
  *    exploded tokens and partial-aggregates per doc — document text
  *    never shuffles, and the per-doc sum combines map-side.
  *  - The model frame is memoized per (session, dataset) and
  *    localCheckpoint-pinned ([[Similarity.memo]], the ANN-artifact
  *    precedent), so train and score share ONE counting pass.
  *
  * Reference scope: the reference engine (duckdb-pst) ships no
  * classifier trainer — this extends the LLM-pipeline surface of the
  * brief (quality scoring) with its trained counterpart.
  */
object Classifier {

  /** Build counter for the spec that pins "train and score share one
    * counting pass".
    */
  private[graft] val nbModelBuilds = new AtomicLong(0)

  /** ⌊ln(x)·10⁶+0.5⌋ as BIGINT — the house ppm-quantized ln; Spark's
    * `log` codegen and DuckDB's `ln` evaluate the same double op.
    */
  private def lnPpm(x: Column): Column = floor(log(x) * 1e6 + 0.5)

  /** The trained model: (token, cnt_pos, cnt_neg, llr_ppm), memoized
    * per (session, dataset) and pinned so neither consumer re-runs the
    * corpus pass through lineage.
    */
  private[graft] def nbModel(s: SparkSession, d: String): DataFrame =
    Similarity.memo(s, d, "nb-model") {
      nbModelBuilds.incrementAndGet()
      val counts = Tables.documents(s, d)
        .select((col("source") === "src0").as("pos"),
          explode(TextOps.wsTokens(lower(col("text")))).as("token"))
        .groupBy("token")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cnt_pos"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("cnt_neg"))
      val totals = counts
        .agg(sum(col("cnt_pos")).as("np"), sum(col("cnt_neg")).as("nn"),
          count(lit(1)).as("v"))
      counts.crossJoin(broadcast(totals))
        .select(col("token"), col("cnt_pos"), col("cnt_neg"),
          (lnPpm((col("cnt_pos") + 1).cast("double") /
              (col("np") + col("v"))) -
            lnPpm((col("cnt_neg") + 1).cast("double") /
              (col("nn") + col("v")))).as("llr_ppm"))
        .localCheckpoint()
    }

  /** Per-document NB margin (doc_id, source, score_ppm): the one
    * corpus scoring pass — explode tokens, broadcast-join the model,
    * partial-aggregate per doc — shared by [[qNbScore]] and
    * [[qNbAuc]] so the two stay the same population by construction.
    */
  private def scoredDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(TextOps.wsTokens(lower(col("text")))).as("token"))
      .join(broadcast(nbModel(s, d).select("token", "llr_ppm")), "token")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("llr_ppm")).as("score_ppm"))

  /** Class-prior margin in ppm as a 1-row frame — shared by
    * [[qNbScore]] and [[qNbThresholds]].
    */
  private def priorsDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("dp"),
        sum(when(col("source") === "src0", 0L).otherwise(1L)).as("dn"))
      .select((lnPpm(col("dp").cast("double") / (col("dp") + col("dn"))) -
        lnPpm(col("dn").cast("double") / (col("dp") + col("dn"))))
        .as("prior_ppm"))

  /** The shared oracle model CTEs (toks → counts → tot → model). */
  private def oracleModelCtes: String =
    """toks AS MATERIALIZED (
      |  SELECT doc_id, source, (source = 'src0') AS pos,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |      t -> t <> '')) AS token
      |  FROM documents),
      |counts AS MATERIALIZED (
      |  SELECT token,
      |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos,
      |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cnt_neg
      |  FROM toks GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(cnt_pos) AS BIGINT) AS np,
      |    CAST(sum(cnt_neg) AS BIGINT) AS nn,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM counts),
      |model AS MATERIALIZED (
      |  SELECT token, cnt_pos, cnt_neg,
      |    CAST(floor(ln(CAST(cnt_pos + 1 AS DOUBLE) / (np + v)) * 1e6 + 0.5)
      |       - floor(ln(CAST(cnt_neg + 1 AS DOUBLE) / (nn + v)) * 1e6 + 0.5)
      |      AS BIGINT) AS llr_ppm
      |  FROM counts, tot)""".stripMargin

  /** q_nb_train — the trained model artifact: per-token class counts
    * and the quantized log-likelihood-ratio weight. This is the table
    * a quality filter ships (and a human audits: the most
    * positive/negative tokens ARE the classifier's explanation).
    */
  val qNbTrain = Q(
    "q_nb_train",
    (s, d) => nbModel(s, d).orderBy("token"),
    Some(
      s"""WITH $oracleModelCtes
         |SELECT token, cnt_pos, cnt_neg, llr_ppm
         |FROM model ORDER BY token""".stripMargin
    )
  )

  /** q_nb_score — apply the trained model to every document and roll
    * up per source: docs routed to the positive class (score + prior
    * > 0) and the exact mean margin. In-sample by construction — this
    * is the corpus-routing audit a pipeline reads before setting a
    * retention threshold (the GPT-3 filter kept a Pareto-sampled
    * fraction by exactly this margin).
    *
    * Exactness: per-doc score is a BIGINT sum of quantized llr terms;
    * the class prior is the same quantized-ln construction over doc
    * counts; the per-source mean is one exact integral division with
    * the sum carried in DECIMAL(38,0)/HUGEINT (a BIGINT sum wraps past
    * ~9.2e18 ppm — reachable at 10⁹ docs × 10⁷-ppm margins, i.e. the
    * 100 TB regime).
    *
    * 100 TB shape: one broadcast join of the vocabulary-sized model to
    * the exploded tokens, one doc-keyed partial-aggregated rollup, one
    * ≤ #sources rollup. Text never shuffles.
    */
  val qNbScore = Q(
    "q_nb_score",
    (s, d) => {
      scoredDocs(s, d)
        .crossJoin(broadcast(priorsDf(s, d)))
        .select(col("source"),
          (col("score_ppm") + col("prior_ppm")).as("total_ppm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("total_ppm") > 0, 1L).otherwise(0L))
            .as("n_pred_pos"),
          sum(col("total_ppm").cast("decimal(38,0)")).as("sum_margin"))
        .select(col("source"), col("n_docs"), col("n_pred_pos"),
          expr("CAST(sum_margin div n_docs AS BIGINT)")
            .as("mean_margin_ppm"))
        .orderBy("source")
    },
    Some(
      s"""WITH $oracleModelCtes,
         |prior AS (
         |  SELECT CAST(floor(ln(CAST(dp AS DOUBLE) / (dp + dn)) * 1e6 + 0.5)
         |          - floor(ln(CAST(dn AS DOUBLE) / (dp + dn)) * 1e6 + 0.5)
         |    AS BIGINT) AS prior_ppm
         |  FROM (SELECT
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dp,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END)
         |      AS BIGINT) AS dn
         |    FROM documents)),
         |scored AS (
         |  SELECT t.doc_id, t.source,
         |    CAST(sum(m.llr_ppm) AS BIGINT) + (SELECT prior_ppm FROM prior)
         |      AS total_ppm
         |  FROM toks t JOIN model m USING (token)
         |  GROUP BY t.doc_id, t.source)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN total_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pred_pos,
         |  CAST(CAST(sum(total_ppm) AS HUGEINT) // count(*) AS BIGINT)
         |    AS mean_margin_ppm
         |FROM scored GROUP BY source ORDER BY source""".stripMargin
    )
  )

  /** q_nb_auc — in-sample ROC-AUC of the trained classifier: rank
    * every document by its NB margin and ask how well that ranking
    * separates the curated source from the rest — the eval a pipeline
    * runs on a freshly-trained quality filter before trusting its
    * threshold (train → score → AUC is the complete workflow;
    * q_auc audits a raw heuristic the same way).
    *
    * Exactness: scores are the BIGINT ppm margins; AUC uses the
    * tie-corrected Mann-Whitney statistic over the per-score (p, q)
    * count frame (the q_auc construction, Hanley & McNeil 1982):
    * AUC·2PN = Σ_v p_v·(2·negBelow(v) + q_v), pair products carried in
    * DECIMAL(38,0)/HUGEINT, one exact integral division to auc_ppm.
    *
    * 100 TB shape: scoring is the broadcast-join token pass; the
    * running negative count uses [[Distributed.globalCumSum]]'s ranged
    * two-pass prefix sum over the score order — score cardinality is
    * corpus-sized, so a single-partition `sum() OVER (ORDER BY v)`
    * window would serialize on one reducer.
    */
  val qNbAuc = Q(
    "q_nb_auc",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val byv = scoredDocs(s, d)
        .select(col("score_ppm").as("v"),
          when(col("source") === "src0", 1L).otherwise(0L).as("isp"))
        .groupBy("v").agg(
          sum(col("isp")).as("p"),
          (count(lit(1)) - sum(col("isp"))).as("q"))
        // pinned: byv feeds both the prefix sum and the totals — its
        // lineage is the whole corpus scoring pass
        .localCheckpoint()
      val cum = Distributed.globalCumSum(byv, Seq(col("v")), col("q"), "cq")
      val tot = byv.agg(sum(col("p")).as("pn"), sum(col("q")).as("qn"))
      cum
        .agg(sum(col("p").cast(dec) *
          (lit(2) * (col("cq") - col("q")).cast(dec) + col("q").cast(dec)))
          .as("num2"))
        .crossJoin(broadcast(tot))
        .select(col("pn").as("pos_n"), col("qn").as("neg_n"),
          expr("CAST((num2 * 1000000) div " +
            "(2 * CAST(pn AS DECIMAL(38,0)) * CAST(qn AS DECIMAL(38,0))) " +
            "AS BIGINT)").as("auc_ppm"))
    },
    Some(
      s"""WITH $oracleModelCtes,
         |scored AS (
         |  SELECT t.doc_id,
         |    CASE WHEN t.source = 'src0' THEN 1 ELSE 0 END AS isp,
         |    CAST(sum(m.llr_ppm) AS BIGINT) AS v
         |  FROM toks t JOIN model m USING (token)
         |  GROUP BY t.doc_id, t.source),
         |byv AS (
         |  SELECT v, CAST(sum(isp) AS BIGINT) AS p,
         |    CAST(count(*) - sum(isp) AS BIGINT) AS q
         |  FROM scored GROUP BY v),
         |cum AS (
         |  SELECT p, q,
         |    CAST(sum(q) OVER (ORDER BY v) AS BIGINT) AS cq
         |  FROM byv),
         |atot AS (
         |  SELECT CAST(sum(p) AS BIGINT) AS pn, CAST(sum(q) AS BIGINT) AS qn
         |  FROM byv)
         |SELECT pn AS pos_n, qn AS neg_n,
         |  CAST((sum(CAST(p AS HUGEINT) * (2 * (cq - q) + q)) * 1000000) //
         |    (2 * CAST(pn AS HUGEINT) * qn) AS BIGINT) AS auc_ppm
         |FROM cum, atot GROUP BY pn, qn""".stripMargin
    )
  )

  /** Retention thresholds swept, in margin ppm (the fixture margins
    * cluster around the class prior ≈ −2.9·10⁶ ppm, so the ladder
    * brackets it).
    */
  private val Thresholds: Seq[Long] =
    (-10 to -3).map(_ * 500000L)

  /** q_nb_thresholds — the retention-threshold sweep: for each
    * candidate margin threshold t, how many documents would be kept
    * (margin + prior > t), how many of those are truly curated, and
    * the exact precision / recall / F1 — the table a pipeline reads to
    * SET the quality-filter threshold, the classifier sibling of the
    * IVF nprobe recall ladder (a tuning-knob sweep, not a single
    * operating point). AUC (q_nb_auc) says the ranking is good;
    * this says where to cut it.
    *
    * Exactness: margins are exact ppm integers; for each rung,
    * precision = TP·10⁶ div kept (0 when nothing kept), recall =
    * TP·10⁶ div P, and F1 = 2·TP·10⁶ div (kept + P) — the algebraic
    * identity F1 = 2TP/(kept+P) avoids any intermediate rounding.
    * Products are carried in DECIMAL(38,0)/HUGEINT.
    *
    * 100 TB shape: ONE aggregate computes every rung as conditional
    * partial-aggregated sums over the scored-docs pass (shared via
    * [[scoredDocs]] with score/AUC); the 8-rung table is then a
    * map-only explode of a 1-row frame. No per-threshold rescans.
    */
  val qNbThresholds = Q(
    "q_nb_thresholds",
    (s, d) => {
      val scored = scoredDocs(s, d)
        .crossJoin(broadcast(priorsDf(s, d)))
        .select((col("score_ppm") + col("prior_ppm")).as("v"),
          when(col("source") === "src0", 1L).otherwise(0L).as("isp"))
      val aggCols = sum(col("isp")).as("pos_n") +:
        Thresholds.flatMap(t => Seq(
          sum(when(col("v") > t, 1L).otherwise(0L)).as(s"k$t"),
          sum(when(col("v") > t && col("isp") === 1L, 1L).otherwise(0L))
            .as(s"tp$t")))
      val one = scored.agg(aggCols.head, aggCols.tail: _*)
      val rungs = array(Thresholds.map(t => struct(
        lit(t).as("threshold_ppm"), col(s"k$t").as("n_kept"),
        col(s"tp$t").as("n_pos_kept"))): _*)
      one.select(col("pos_n"), explode(rungs).as("r"))
        .select(col("r.threshold_ppm"), col("r.n_kept"),
          col("r.n_pos_kept"),
          expr("CASE WHEN r.n_kept = 0 THEN 0 ELSE " +
            "CAST((CAST(r.n_pos_kept AS DECIMAL(38,0)) * 1000000) " +
            "div r.n_kept AS BIGINT) END").as("precision_ppm"),
          expr("CAST((CAST(r.n_pos_kept AS DECIMAL(38,0)) * 1000000) " +
            "div pos_n AS BIGINT)").as("recall_ppm"),
          expr("CAST((CAST(r.n_pos_kept AS DECIMAL(38,0)) * 2000000) " +
            "div (r.n_kept + pos_n) AS BIGINT)").as("f1_ppm"))
        .orderBy("threshold_ppm")
    },
    Some {
      val tList = Thresholds.mkString(", ")
      s"""WITH $oracleModelCtes,
         |prior AS (
         |  SELECT CAST(floor(ln(CAST(dp AS DOUBLE) / (dp + dn)) * 1e6 + 0.5)
         |          - floor(ln(CAST(dn AS DOUBLE) / (dp + dn)) * 1e6 + 0.5)
         |    AS BIGINT) AS prior_ppm
         |  FROM (SELECT
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dp,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END)
         |      AS BIGINT) AS dn
         |    FROM documents)),
         |scored AS (
         |  SELECT CAST(sum(m.llr_ppm) AS BIGINT) +
         |      (SELECT prior_ppm FROM prior) AS v,
         |    CASE WHEN t.source = 'src0' THEN 1 ELSE 0 END AS isp
         |  FROM toks t JOIN model m USING (token)
         |  GROUP BY t.doc_id, t.source),
         |rungs AS (
         |  SELECT CAST(u.t AS BIGINT) AS threshold_ppm,
         |    CAST(sum(CASE WHEN v > u.t THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_kept,
         |    CAST(sum(CASE WHEN v > u.t AND isp = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_pos_kept,
         |    CAST(sum(isp) AS BIGINT) AS pos_n
         |  FROM scored, UNNEST([$tList]) AS u(t)
         |  GROUP BY u.t)
         |SELECT threshold_ppm, n_kept, n_pos_kept,
         |  CASE WHEN n_kept = 0 THEN 0 ELSE
         |    CAST((CAST(n_pos_kept AS HUGEINT) * 1000000) // n_kept
         |      AS BIGINT) END AS precision_ppm,
         |  CAST((CAST(n_pos_kept AS HUGEINT) * 1000000) // pos_n
         |    AS BIGINT) AS recall_ppm,
         |  CAST((CAST(n_pos_kept AS HUGEINT) * 2000000) // (n_kept + pos_n)
         |    AS BIGINT) AS f1_ppm
         |FROM rungs ORDER BY threshold_ppm""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(qNbTrain, qNbScore, qNbAuc, qNbThresholds)
}
