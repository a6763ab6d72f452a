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
  *  - The model is vocabulary-sized; scoring joins it to the exploded
  *    tokens through the size gate ([[Distributed.modelJoin]]:
  *    broadcast under the row threshold, token-keyed shuffle join
  *    above — a web corpus's raw-token vocabulary is Heaps-sublinear
  *    but unbounded) and partial-aggregates per doc — document text
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

  /** The counting pass shared by the full-corpus and the
    * holdout-train models: one vocabulary-keyed conditional-sum
    * aggregate over `docs` (needs `source`, `text`), then the three
    * scalars (N⁺, N⁻, V) ride a broadcast 1-row cross join.
    */
  private def buildModel(docs: DataFrame): DataFrame =
    buildModelTokens(docs
      .select((col("source") === "src0").as("pos"),
        explode(TextOps.wsTokens(lower(col("text")))).as("token")))

  /** [[buildModel]] over an already-exploded (pos, token) stream — the
    * entry point for callers that must attach per-doc metadata (e.g.
    * the holdout split) BEFORE the counting pass, so the metadata join
    * moves (doc_id, token) pairs instead of raw text.
    */
  private def buildModelTokens(toks: DataFrame): DataFrame = {
    val counts = toks
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
  }

  /** The trained model: (token, cnt_pos, cnt_neg, llr_ppm), memoized
    * per (session, dataset) WITH its row count and pinned so no
    * consumer re-runs the corpus pass through lineage. The count is
    * one cheap job over the pinned blocks and feeds the size gate of
    * every downstream [[Distributed.modelJoin]].
    */
  private[graft] def nbModelWithRows(s: SparkSession, d: String)
      : (DataFrame, Long) =
    Similarity.memo(s, d, "nb-model") {
      nbModelBuilds.incrementAndGet()
      val m = buildModel(Tables.documents(s, d)).localCheckpoint()
      (m, m.count())
    }

  private[graft] def nbModel(s: SparkSession, d: String): DataFrame =
    nbModelWithRows(s, d)._1

  /** Per-document NB margin (doc_id, source, score_ppm): the one
    * corpus scoring pass — explode tokens, size-gated-join the model
    * ([[Distributed.modelJoin]]: broadcast under the row threshold,
    * token-keyed shuffle join above), partial-aggregate per doc, then
    * LEFT-join back to the document frame so a token-less (empty-text)
    * document scores 0 instead of silently dropping out of the
    * n_docs / AUC / threshold populations. Shared by [[qNbScore]],
    * [[qNbAuc]] and [[qNbThresholds]] so the three stay the same
    * population by construction.
    *
    * 100 TB shape: the token join moves (token, doc_id) pairs keyed on
    * the vocabulary; the doc-side rejoin moves (doc_id, source) pairs
    * only — document text never shuffles on either path.
    */
  private def scoredDocs(s: SparkSession, d: String): DataFrame = {
    val (model, rows) = nbModelWithRows(s, d)
    scoredDocsWith(s, d, model, rows)
  }

  /** [[scoredDocs]] with the model supplied by the caller — the entry
    * point a PERSISTED model artifact serves through
    * ([[ModelStore]]/q_model_artifact_nb): the stored weight table
    * rides the same size-gated join; only the model's origin differs.
    */
  private[ops] def scoredDocsWith(s: SparkSession, d: String,
      model: DataFrame, rows: Long): DataFrame = {
    val tokScores = Distributed.modelJoin(
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.wsTokens(lower(col("text")))).as("token")),
      model.select("token", "llr_ppm"), rows, Seq("token"))
      .groupBy("doc_id")
      .agg(sum(col("llr_ppm")).as("tok_ppm"))
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(tokScores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("tok_ppm"), lit(0L)).as("score_ppm"))
  }

  /** Class-prior margin in ppm as a 1-row frame — shared by
    * [[qNbScore]] and [[qNbThresholds]]. Guarded: an empty class
    * (dp = 0 or dn = 0) yields prior 0 instead of ln(0) — Spark's
    * `log` returns NULL there while DuckDB's `ln` raises on the
    * -inf→BIGINT cast, a divergent failure mode without the guard.
    */
  private[ops] def priorsDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("dp"),
        sum(when(col("source") === "src0", 0L).otherwise(1L)).as("dn"))
      .select(when(col("dp") === 0 || col("dn") === 0, lit(0L))
        .otherwise(
          lnPpm(col("dp").cast("double") / (col("dp") + col("dn"))) -
            lnPpm(col("dn").cast("double") / (col("dp") + col("dn"))))
        .as("prior_ppm"))

  /** The shared oracle model CTEs (toks → counts → tot → model),
    * name-prefixed with `p` and trained over `docsRel` (any relation
    * exposing doc_id, source, text — `documents` for the full-corpus
    * model, the train split for the holdout model).
    */
  private[ops] def oracleModelCtes(p: String = "",
      docsRel: String = "documents"): String =
    s"""${p}toks AS MATERIALIZED (
       |  SELECT doc_id, source, (source = 'src0') AS pos,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
       |      t -> t <> '')) AS token
       |  FROM $docsRel),
       |${p}counts AS MATERIALIZED (
       |  SELECT token,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos,
       |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cnt_neg
       |  FROM ${p}toks GROUP BY 1),
       |${p}tot AS (
       |  SELECT CAST(sum(cnt_pos) AS BIGINT) AS np,
       |    CAST(sum(cnt_neg) AS BIGINT) AS nn,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM ${p}counts),
       |${p}model AS MATERIALIZED (
       |  SELECT token, cnt_pos, cnt_neg,
       |    CAST(floor(ln(CAST(cnt_pos + 1 AS DOUBLE) / (np + v)) * 1e6 + 0.5)
       |       - floor(ln(CAST(cnt_neg + 1 AS DOUBLE) / (nn + v)) * 1e6 + 0.5)
       |      AS BIGINT) AS llr_ppm
       |  FROM ${p}counts, ${p}tot)""".stripMargin

  /** The oracle's per-doc scored frame: LEFT join documents to the
    * per-doc token llr sums (mirrors [[scoredDocs]] — token-less docs
    * keep score 0).
    */
  private[ops] def oracleScoredCte: String =
    """scored0 AS (
      |  SELECT d.doc_id, d.source, coalesce(ts.v, 0) AS score_ppm
      |  FROM documents d LEFT JOIN (
      |    SELECT t.doc_id, CAST(sum(m.llr_ppm) AS BIGINT) AS v
      |    FROM toks t JOIN model m USING (token) GROUP BY t.doc_id) ts
      |  USING (doc_id))""".stripMargin

  /** The oracle's guarded class-prior CTE (mirrors [[priorsDf]]). */
  private[ops] def oraclePriorCte: String =
    """prior AS (
      |  SELECT CASE WHEN dp = 0 OR dn = 0 THEN 0 ELSE
      |    CAST(floor(ln(CAST(dp AS DOUBLE) / (dp + dn)) * 1e6 + 0.5)
      |       - floor(ln(CAST(dn AS DOUBLE) / (dp + dn)) * 1e6 + 0.5)
      |      AS BIGINT) END AS prior_ppm
      |  FROM (SELECT
      |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dp,
      |    CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS dn
      |    FROM documents))""".stripMargin

  /** q_nb_train — the trained model artifact: per-token class counts
    * and the quantized log-likelihood-ratio weight. This is the table
    * a quality filter ships (and a human audits: the most
    * positive/negative tokens ARE the classifier's explanation).
    */
  val qNbTrain = Q(
    "q_nb_train",
    (s, d) => nbModel(s, d).orderBy("token"),
    Some(
      s"""WITH ${oracleModelCtes()}
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
    * 100 TB shape: one size-gated join of the vocabulary-sized model to
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
      s"""WITH ${oracleModelCtes()},
         |$oraclePriorCte,
         |$oracleScoredCte,
         |scored AS (
         |  SELECT doc_id, source,
         |    score_ppm + (SELECT prior_ppm FROM prior) AS total_ppm
         |  FROM scored0)
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
    * 100 TB shape: scoring is the gated model-join token pass; the
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
          expr("CASE WHEN pn = 0 OR qn = 0 THEN 0 ELSE " +
            "CAST((num2 * 1000000) div " +
            "(2 * CAST(pn AS DECIMAL(38,0)) * CAST(qn AS DECIMAL(38,0))) " +
            "AS BIGINT) END").as("auc_ppm"))
    },
    Some(
      s"""WITH ${oracleModelCtes()},
         |$oracleScoredCte,
         |scored AS (
         |  SELECT doc_id,
         |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS isp,
         |    score_ppm AS v
         |  FROM scored0),
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
         |  CASE WHEN pn = 0 OR qn = 0 THEN 0 ELSE
         |    CAST((sum(CAST(p AS HUGEINT) * (2 * (cq - q) + q)) * 1000000) //
         |      (2 * CAST(pn AS HUGEINT) * qn) AS BIGINT) END AS auc_ppm
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
          expr("CASE WHEN pos_n = 0 THEN 0 ELSE " +
            "CAST((CAST(r.n_pos_kept AS DECIMAL(38,0)) * 1000000) " +
            "div pos_n AS BIGINT) END").as("recall_ppm"),
          expr("CASE WHEN r.n_kept + pos_n = 0 THEN 0 ELSE " +
            "CAST((CAST(r.n_pos_kept AS DECIMAL(38,0)) * 2000000) " +
            "div (r.n_kept + pos_n) AS BIGINT) END").as("f1_ppm"))
        .orderBy("threshold_ppm")
    },
    Some {
      val tList = Thresholds.mkString(", ")
      s"""WITH ${oracleModelCtes()},
         |$oraclePriorCte,
         |$oracleScoredCte,
         |scored AS (
         |  SELECT score_ppm + (SELECT prior_ppm FROM prior) AS v,
         |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS isp
         |  FROM scored0),
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
         |  CASE WHEN pos_n = 0 THEN 0 ELSE
         |    CAST((CAST(n_pos_kept AS HUGEINT) * 1000000) // pos_n
         |      AS BIGINT) END AS recall_ppm,
         |  CASE WHEN n_kept + pos_n = 0 THEN 0 ELSE
         |    CAST((CAST(n_pos_kept AS HUGEINT) * 2000000) // (n_kept + pos_n)
         |      AS BIGINT) END AS f1_ppm
         |FROM rungs ORDER BY threshold_ppm""".stripMargin
    }
  )

  // ------------------------------------------------- holdout evaluation

  /** Near-dup cluster labels for the split key: connected components
    * of the MinHash-LSH pair graph ([[Dedup.connectedComponentsStar]]
    * over [[Dedup.lshPairs]] — q_dedup_clusters' machinery), memoized
    * with the label count and pinned. Only docs that HAVE a near-dup
    * appear; everything else clusters to itself downstream.
    */
  private[graft] def splitLabelsWithRows(s: SparkSession, d: String)
      : (DataFrame, Long) =
    Similarity.memo(s, d, "nb-split-labels") {
      val l = Dedup.connectedComponentsStar(
        Dedup.lshPairs(s, d)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
        .select(col("node").as("doc_id"), col("component_id"))
        .localCheckpoint()
      (l, l.count())
    }

  /** Leakage-safe document split assignment — the text-corpus analog
    * of [[Multimodal.qClusterSafeSplit]] (which splits only the
    * doc_id%3==0 image assets on the PERCEPTUAL cluster; the text
    * classifier's population is every document, so its split keys on
    * the text near-dup cluster instead). Split key = the near-dup
    * component id (a doc with no near-dup keys to itself); bucket =
    * md5(key) % 10 → 8/1/1 train/val/test, so a near-duplicate can
    * never land in train while its twin sits in val — the leakage
    * mode that inflates holdout scores the moment dedup is
    * approximate.
    *
    * 100 TB shape: the label frame holds one row per doc WITH a
    * near-dup — a corpus fraction, so the probe-side join rides the
    * size gate ([[Distributed.modelJoin]]: broadcast while small,
    * doc_id-keyed shuffle join once near-dup membership is
    * corpus-scale); the split itself is a deterministic map-side
    * hash. Raw document TEXT never rides this join: every consumer
    * attaches the split to a frame of doc_id-keyed scalars (the split
    * audit) or to the already-exploded token stream (the holdout
    * counting pass) — so the above-threshold shuffle arm moves
    * (doc_id, token/scalar) pairs, never document strings.
    */
  private def assignSplit(df: DataFrame, s: SparkSession, d: String)
      : DataFrame = {
    val (labels, rows) = splitLabelsWithRows(s, d)
    Distributed.modelJoin(df, labels, rows, Seq("doc_id"),
      joinType = "left")
      .withColumn("ckey", coalesce(col("component_id"), col("doc_id")))
      .withColumn("bucket",
        (conv(substring(md5(col("ckey").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10).cast("int"))
      .withColumn("split",
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val").otherwise("test"))
      .drop("component_id", "bucket")
  }

  /** The narrow split-assignment frame (doc_id, source, ckey, split) —
    * no text column, so the gated label join never moves document
    * strings in its shuffle arm (the r11 ADVICE finding: the old form
    * joined the FULL document frame, so above the broadcast threshold
    * text shuffled, contradicting the scaladoc).
    */
  private def splitAssign(s: SparkSession, d: String): DataFrame =
    assignSplit(
      Tables.documents(s, d).select(col("doc_id"), col("source")), s, d)
      .select("doc_id", "source", "ckey", "split")

  /** hex(8 chars) → BIGINT without conv(): positional arithmetic (the
    * qClusterSafeSplit construction, proven hash-identical to Spark's
    * conv/substring/md5).
    */
  private def hexToLongSql(h: String): String =
    (0 until 8).map { k =>
      val mult = 1L << (4 * (7 - k))
      s"(strpos('0123456789abcdef', substr($h, ${1 + k}, 1)) - 1) * $mult"
    }.mkString("(", " + ", ")")

  /** The shared oracle split chain: LSH pairs → CC (recursive reach,
    * the q_dedup_clusters oracle form) → coalesced cluster key →
    * md5-bucketed 8/1/1 split. Requires WITH RECURSIVE.
    */
  private def oracleSplitCtes: String =
    s"""pairs AS (${Dedup.lshPairsSql}),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src AS node, src AS r FROM edges
       |  UNION
       |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
       |comp AS (
       |  SELECT node AS doc_id, min(r) AS component_id
       |  FROM reach GROUP BY node),
       |sp AS MATERIALIZED (
       |  SELECT doc_id, source, text, ckey,
       |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |      ELSE 'test' END AS split
       |  FROM (SELECT d.doc_id, d.source, d.text,
       |      coalesce(c.component_id, d.doc_id) AS ckey,
       |      ${hexToLongSql(
                 "substr(md5(CAST(coalesce(c.component_id, d.doc_id) " +
                   "AS VARCHAR)), 1, 8)")} % 10 AS b
       |    FROM documents d LEFT JOIN comp c USING (doc_id)))""".stripMargin

  /** q_nb_split — the leakage-safe split audit: per-split document,
    * positive-class, and cluster counts plus n_leaky_clusters
    * (clusters observed in >1 split — 0 BY CONSTRUCTION, present as
    * the measured alarm column, the [[Multimodal.qClusterSafeSplit]]
    * discipline). This is the population table [[qNbAucHoldout]]
    * evaluates on.
    */
  val qNbSplit = Q(
    "q_nb_split",
    (s, d) => {
      val assigned = splitAssign(s, d)
      val leaky = assigned.groupBy("ckey")
        .agg(countDistinct(col("split")).as("ns"))
        .agg(sum(when(col("ns") > 1, 1L).otherwise(0L))
          .as("n_leaky_clusters"))
      assigned.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n_pos"),
          countDistinct(col("ckey")).as("n_clusters"))
        .crossJoin(broadcast(leaky))
        .orderBy("split")
    },
    Some(
      s"""WITH RECURSIVE $oracleSplitCtes,
         |leaky AS (
         |  SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_leaky_clusters
         |  FROM (SELECT ckey, count(DISTINCT split) AS ns
         |        FROM sp GROUP BY ckey))
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pos,
         |  CAST(count(DISTINCT ckey) AS BIGINT) AS n_clusters,
         |  (SELECT n_leaky_clusters FROM leaky) AS n_leaky_clusters
         |FROM sp GROUP BY split ORDER BY split""".stripMargin
    )
  )

  /** The holdout model — the same closed-form counting pass as
    * [[nbModel]] but trained ONLY on the train split, memoized with
    * its row count for the scoring join's size gate. Val/test rows
    * never enter this aggregate by construction (the split filter is
    * upstream of the counting pass). Tokens explode map-side BEFORE
    * the split join ([[scoredDocs]]' discipline), so the gated label
    * join's shuffle arm moves (doc_id, token) pairs — document text
    * never shuffles on this path either.
    */
  private[graft] def nbHoldoutModelWithRows(s: SparkSession, d: String)
      : (DataFrame, Long) =
    Similarity.memo(s, d, "nb-model-holdout") {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), (col("source") === "src0").as("pos"),
          explode(TextOps.wsTokens(lower(col("text")))).as("token"))
      val m = buildModelTokens(
        assignSplit(toks, s, d).filter(col("split") === "train")
          .select("pos", "token"))
        .localCheckpoint()
      (m, m.count())
    }

  /** q_nb_auc_holdout — out-of-sample evaluation of the trained
    * filter: the model trains on the leakage-safe TRAIN split only,
    * then ranks both the train and the val split; the two AUC rows
    * side by side are the overfitting audit a pipeline reads before
    * trusting a retention threshold (q_nb_auc's whole-corpus number
    * is in-sample by declaration; the train−val gap here is the
    * number that says how much of it is memorization). Val tokens
    * unseen in training contribute 0 (they exist in neither class's
    * counts — the ratio of their Laplace fallbacks is prior-neutral
    * under this quantization), and a val doc with NO known tokens
    * scores 0, kept in the population by the left join.
    *
    * Exactness: same construction as [[qNbAuc]] (tie-corrected
    * Mann-Whitney over per-score count frames, DECIMAL(38,0)/HUGEINT
    * pair products, one integral division), guarded to 0 when a split
    * lacks a class.
    *
    * 100 TB shape: split assignment is the gated label join;
    * training is one vocab-keyed pass over ~80% of the corpus;
    * scoring is the gated model join + doc-keyed rollup; each split's
    * running negative count rides [[Distributed.globalCumSum]]'s
    * ranged two-pass prefix sum. Text never shuffles.
    */
  /** Every document scored under the HOLDOUT (train-only) model:
    * (split, isp, v) for all three splits — memoized and pinned so
    * [[qNbAucHoldout]] and [[qNbTestReport]] share ONE scoring pass.
    */
  private[graft] def holdoutScored(s: SparkSession, d: String): DataFrame =
    Similarity.memo(s, d, "nb-holdout-scored") {
      val (model, mrows) = nbHoldoutModelWithRows(s, d)
      val tokScores = Distributed.modelJoin(
        Tables.documents(s, d).select(col("doc_id"),
          explode(TextOps.wsTokens(lower(col("text")))).as("token")),
        model.select("token", "llr_ppm"), mrows, Seq("token"))
        .groupBy("doc_id")
        .agg(sum(col("llr_ppm")).as("tok_ppm"))
      splitAssign(s, d)
        .select(col("doc_id"), col("split"),
          when(col("source") === "src0", 1L).otherwise(0L).as("isp"))
        .join(tokScores, Seq("doc_id"), "left")
        .select(col("split"), col("isp"),
          coalesce(col("tok_ppm"), lit(0L)).as("v"))
        .localCheckpoint()
    }

  val qNbAucHoldout = Q(
    "q_nb_auc_holdout",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val scored = holdoutScored(s, d)
        .filter(col("split").isin("train", "val"))
      def aucOf(sp: String): DataFrame = {
        val byv = scored.filter(col("split") === sp)
          .groupBy("v").agg(
            sum(col("isp")).as("p"),
            (count(lit(1)) - sum(col("isp"))).as("q"))
          .localCheckpoint() // feeds both the prefix sum and the totals
        val cum = Distributed.globalCumSum(byv, Seq(col("v")), col("q"),
          "cq")
        val tot = byv.agg(sum(col("p")).as("pn"), sum(col("q")).as("qn"))
        cum
          .agg(sum(col("p").cast(dec) *
            (lit(2) * (col("cq") - col("q")).cast(dec) +
              col("q").cast(dec))).as("num2"))
          .crossJoin(broadcast(tot))
          .select(lit(sp).as("split"),
            coalesce(col("pn"), lit(0L)).as("pos_n"),
            coalesce(col("qn"), lit(0L)).as("neg_n"),
            expr("CASE WHEN pn IS NULL OR qn IS NULL OR pn = 0 OR qn = 0 " +
              "THEN 0 ELSE CAST((num2 * 1000000) div " +
              "(2 * CAST(pn AS DECIMAL(38,0)) * CAST(qn AS DECIMAL(38,0)))" +
              " AS BIGINT) END").as("auc_ppm"))
      }
      // a split with zero documents emits NO row (matching the
      // oracle's GROUP BY split, which has no row to group on a
      // degenerate corpus where train or val is empty) — without the
      // filter the engine's per-split global aggregate emits an
      // all-zero row the oracle lacks (r11 ADVICE)
      aucOf("train").union(aucOf("val"))
        .filter(col("pos_n") + col("neg_n") > 0)
        .orderBy("split")
    },
    Some(
      s"""WITH RECURSIVE $oracleSplitCtes,
         |${oracleModelCtes("h",
             "(SELECT doc_id, source, text FROM sp WHERE split = 'train')")},
         |hstoks AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(
         |    lower(text), '\\s+'), t -> t <> '')) AS token
         |  FROM sp WHERE split IN ('train', 'val')),
         |hts AS (
         |  SELECT t.doc_id, CAST(sum(m.llr_ppm) AS BIGINT) AS v
         |  FROM hstoks t JOIN hmodel m USING (token) GROUP BY t.doc_id),
         |hscored AS (
         |  SELECT s.split,
         |    CASE WHEN s.source = 'src0' THEN 1 ELSE 0 END AS isp,
         |    coalesce(t.v, 0) AS v
         |  FROM sp s LEFT JOIN hts t USING (doc_id)
         |  WHERE s.split IN ('train', 'val')),
         |hbyv AS (
         |  SELECT split, v, CAST(sum(isp) AS BIGINT) AS p,
         |    CAST(count(*) - sum(isp) AS BIGINT) AS q
         |  FROM hscored GROUP BY split, v),
         |hcum AS (
         |  SELECT split, p, q,
         |    CAST(sum(q) OVER (PARTITION BY split ORDER BY v) AS BIGINT)
         |      AS cq
         |  FROM hbyv),
         |htot2 AS (
         |  SELECT split, CAST(sum(p) AS BIGINT) AS pn,
         |    CAST(sum(q) AS BIGINT) AS qn
         |  FROM hbyv GROUP BY split)
         |SELECT c.split, pn AS pos_n, qn AS neg_n,
         |  CASE WHEN pn = 0 OR qn = 0 THEN 0 ELSE
         |    CAST((sum(CAST(p AS HUGEINT) * (2 * (cq - q) + q)) * 1000000)
         |      // (2 * CAST(pn AS HUGEINT) * qn) AS BIGINT) END AS auc_ppm
         |FROM hcum c JOIN htot2 USING (split)
         |GROUP BY c.split, pn, qn ORDER BY split""".stripMargin
    )
  )

  /** q_nb_test_report — the deployment handshake that completes the
    * split discipline: the retention threshold is TUNED on the val
    * split (best exact F1 over every candidate cut of the val score
    * distribution, plus the keep-all cut) and then REPORTED on the
    * test split, which no decision ever touched — train built the
    * model ([[nbHoldoutModelWithRows]]), val chose τ, test only
    * measures. This is the number a pipeline is allowed to publish;
    * reporting val-tuned metrics ON val (or anything in-sample)
    * overstates the filter exactly the way the q_nb_auc_holdout gap
    * quantifies.
    *
    * Threshold selection, engine-exactly: candidates are the DISTINCT
    * val margins (kept = margins strictly greater, the
    * [[qNbThresholds]] convention) plus min−1 (keep-all); TP and kept
    * per candidate come from descending-order prefix sums
    * ([[Distributed.globalCumSum]] — the candidate set is val-sized,
    * i.e. corpus-sized at 100 TB, so a single-partition window is the
    * scale-killer the ranged form avoids); F1 = 2·TP·10⁶ div
    * (kept + P) in one integral division; the argmax breaks ties on
    * (f1 DESC, threshold ASC) — a total order. Test metrics are one
    * conditional aggregate against the broadcast 1-row choice. All
    * ratios guarded to 0 on empty denominators.
    */
  val qNbTestReport = Q(
    "q_nb_test_report",
    (s, d) => {
      val scored = holdoutScored(s, d)
      val vbyv = scored.filter(col("split") === "val")
        .groupBy("v").agg(
          sum(col("isp")).as("p"),
          count(lit(1)).as("n"))
        .localCheckpoint() // feeds min/total, the cums, and the argmax
      val keepAll = vbyv.agg((min(col("v")) - 1).as("v"))
        .select(col("v"), lit(0L).as("p"), lit(0L).as("n"))
      val cand = vbyv.union(keepAll).localCheckpoint()
      val cum1 = Distributed.globalCumSum(cand,
        Seq(col("v").desc), col("p"), "cp")
      val cum = Distributed.globalCumSum(cum1,
        Seq(col("v").desc), col("n"), "cn")
      val tot = vbyv.agg(sum(col("p")).as("pos_v"))
      val best = cum.crossJoin(broadcast(tot))
        .select(col("v").as("threshold_ppm"),
          (col("cp") - col("p")).as("tp"),
          (col("cn") - col("n")).as("kept"), col("pos_v"))
        .select(col("threshold_ppm"),
          expr("CASE WHEN kept + pos_v = 0 THEN 0 ELSE " +
            "CAST((CAST(tp AS DECIMAL(38,0)) * 2000000) " +
            "div (kept + pos_v) AS BIGINT) END").as("val_f1_ppm"))
        .orderBy(col("val_f1_ppm").desc, col("threshold_ppm").asc)
        .limit(1)
      scored.filter(col("split") === "test")
        .crossJoin(broadcast(best))
        .groupBy(col("threshold_ppm"), col("val_f1_ppm"))
        .agg(count(lit(1)).as("test_n"),
          sum(when(col("v") > col("threshold_ppm"), 1L).otherwise(0L))
            .as("test_kept"),
          sum(when(col("v") > col("threshold_ppm") && col("isp") === 1L,
            1L).otherwise(0L)).as("test_tp"),
          sum(col("isp")).as("test_pos"))
        .select(col("threshold_ppm"), col("val_f1_ppm"), col("test_n"),
          col("test_kept"), col("test_tp"),
          expr("CASE WHEN test_kept = 0 THEN 0 ELSE " +
            "CAST((CAST(test_tp AS DECIMAL(38,0)) * 1000000) " +
            "div test_kept AS BIGINT) END").as("test_precision_ppm"),
          expr("CASE WHEN test_pos = 0 THEN 0 ELSE " +
            "CAST((CAST(test_tp AS DECIMAL(38,0)) * 1000000) " +
            "div test_pos AS BIGINT) END").as("test_recall_ppm"),
          expr("CASE WHEN test_kept + test_pos = 0 THEN 0 ELSE " +
            "CAST((CAST(test_tp AS DECIMAL(38,0)) * 2000000) " +
            "div (test_kept + test_pos) AS BIGINT) END")
            .as("test_f1_ppm"))
    },
    Some(
      s"""WITH RECURSIVE $oracleSplitCtes,
         |${oracleModelCtes("h",
             "(SELECT doc_id, source, text FROM sp WHERE split = 'train')")},
         |hstoks AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(
         |    lower(text), '\\s+'), t -> t <> '')) AS token
         |  FROM sp),
         |hts AS (
         |  SELECT t.doc_id, CAST(sum(m.llr_ppm) AS BIGINT) AS v
         |  FROM hstoks t JOIN hmodel m USING (token) GROUP BY t.doc_id),
         |hscored AS (
         |  SELECT s.split,
         |    CASE WHEN s.source = 'src0' THEN 1 ELSE 0 END AS isp,
         |    coalesce(t.v, 0) AS v
         |  FROM sp s LEFT JOIN hts t USING (doc_id)),
         |vbyv AS (
         |  SELECT v, CAST(sum(isp) AS BIGINT) AS p,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM hscored WHERE split = 'val' GROUP BY v),
         |vcand AS (
         |  SELECT v, p, n FROM vbyv
         |  UNION ALL
         |  SELECT min(v) - 1, 0, 0 FROM vbyv),
         |vcum AS (
         |  SELECT v, p, n,
         |    CAST(sum(p) OVER (ORDER BY v DESC) AS BIGINT) AS cp,
         |    CAST(sum(n) OVER (ORDER BY v DESC) AS BIGINT) AS cn
         |  FROM vcand),
         |vtot AS (SELECT CAST(sum(p) AS BIGINT) AS pos_v FROM vbyv),
         |best AS (
         |  SELECT v AS threshold_ppm,
         |    CASE WHEN (cn - n) + pos_v = 0 THEN 0 ELSE
         |      CAST((CAST(cp - p AS HUGEINT) * 2000000) //
         |        ((cn - n) + pos_v) AS BIGINT) END AS val_f1_ppm
         |  FROM vcum, vtot
         |  ORDER BY val_f1_ppm DESC, threshold_ppm ASC LIMIT 1),
         |trep AS (
         |  SELECT b.threshold_ppm, b.val_f1_ppm,
         |    CAST(count(*) AS BIGINT) AS test_n,
         |    CAST(sum(CASE WHEN h.v > b.threshold_ppm THEN 1 ELSE 0 END)
         |      AS BIGINT) AS test_kept,
         |    CAST(sum(CASE WHEN h.v > b.threshold_ppm AND h.isp = 1
         |      THEN 1 ELSE 0 END) AS BIGINT) AS test_tp,
         |    CAST(sum(h.isp) AS BIGINT) AS test_pos
         |  FROM hscored h, best b WHERE h.split = 'test'
         |  GROUP BY b.threshold_ppm, b.val_f1_ppm)
         |SELECT threshold_ppm, val_f1_ppm, test_n, test_kept, test_tp,
         |  CASE WHEN test_kept = 0 THEN 0 ELSE
         |    CAST((CAST(test_tp AS HUGEINT) * 1000000) // test_kept
         |      AS BIGINT) END AS test_precision_ppm,
         |  CASE WHEN test_pos = 0 THEN 0 ELSE
         |    CAST((CAST(test_tp AS HUGEINT) * 1000000) // test_pos
         |      AS BIGINT) END AS test_recall_ppm,
         |  CASE WHEN test_kept + test_pos = 0 THEN 0 ELSE
         |    CAST((CAST(test_tp AS HUGEINT) * 2000000) //
         |      (test_kept + test_pos) AS BIGINT) END AS test_f1_ppm
         |FROM trep""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qNbTrain, qNbScore, qNbAuc, qNbThresholds,
    qNbSplit, qNbAucHoldout, qNbTestReport)
}
