package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the operators of this library
  * chained the way a 100 TB pretraining pipeline runs them —
  *
  *   ingest → quality filter → repetition filter → exact dedup →
  *   near-dup cluster dedup → language filter → length filter →
  *   benchmark decontamination → curated corpus (partitioned).
  *
  * Every stage reuses a verified `SparkEntry` operator, so the pipeline
  * inherits their oracle-checked semantics. Stage outputs are persisted
  * once each (the per-stage funnel counts and the final write would
  * otherwise re-run the whole upstream DAG per action); nothing beyond
  * the scalar counts ever reaches the driver.
  */
object CuratePipeline {

  final case class CurateStats(
      nInput: Long,
      nAfterQuality: Long,
      nAfterRepetition: Long,
      nAfterExactDedup: Long,
      nAfterNearDedup: Long,
      nAfterLanguage: Long,
      nAfterTokens: Long,
      nCurated: Long)

  def curate(
      s: SparkSession,
      sfDir: String,
      outDir: Option[String] = None,
      minQuality: Double = 0.45,
      keepLangs: Seq[String] = Seq("en"),
      minTokens: Int = 10,
      maxTopBigramFrac: Double = 0.20): (DataFrame, CurateStats) = {
    val docs = Tables.documents(s, sfDir)

    // stage 1 — quality scoring (oracle-checked op)
    val quality = TextOps.qQualityScore.fn(s, sfDir)
      .select(col("doc_id"), col("quality"))
    // each stage output persists: CurateStats issues one count() per
    // stage, and without materialization every count (and the final
    // write) would re-execute the whole upstream DAG — the heavy
    // gram-explode stages triangularly many times
    val afterQuality = docs
      .join(quality, Seq("doc_id"))
      .filter(col("quality") >= minQuality)
      .persist()

    // stage 1b — repetition filter (Gopher-style, Rae et al. 2021 use
    // 0.20 for the top-bigram share precisely so short documents are
    // not mass-rejected: a clean 12-token doc already has
    // top_bigram_frac ≥ 1/11). NULL frac (docs too short to have
    // bigrams) passes — shortness is minTokens' job, not this stage's.
    val lowRep = TextOps.qRepetition.fn(s, sfDir)
      .filter(coalesce(col("top_bigram_frac") <= maxTopBigramFrac, lit(true)))
      .select("doc_id")
    val afterRepetition = afterQuality.join(lowRep, Seq("doc_id"), "left_semi")
      .persist()

    // stage 2 — exact dedup: keep the representative per content hash
    val keepers = Dedup.qDedupExact.fn(s, sfDir)
      .select(col("keep_id").as("doc_id"))
    val afterExact = afterRepetition.join(keepers, Seq("doc_id"), "left_semi")
      .persist()

    // stage 3 — near-dup dedup: keep cluster representatives
    val nearKeep = Advanced.qDedupDecision.fn(s, sfDir)
      .filter(col("keep")).select("doc_id")
    val afterNear = afterExact.join(nearKeep, Seq("doc_id"), "left_semi")
      .persist()

    // stage 4 — language ID filter
    val lang = TextOps.qLangId.fn(s, sfDir)
      .select(col("doc_id"), col("predicted"))
    val afterLang = afterNear
      .join(lang, Seq("doc_id"))
      .filter(col("predicted").isin(keepLangs: _*))
      .persist()

    // stage 5 — token-count floor
    val tokens = TextOps.qTokenCount.fn(s, sfDir)
      .select(col("doc_id"), col("n_tokens"))
    val afterTokens = afterLang
      .join(tokens, Seq("doc_id"))
      .filter(col("n_tokens") >= minTokens)
      .persist()

    // stage 6 — benchmark decontamination: drop training docs sharing
    // a 13-gram with the held-out benchmark set
    val contaminated = TextOps.qDecontaminate.fn(s, sfDir)
      .select(col("train_id").as("doc_id"))
    val curated = afterTokens
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(docs.columns.map(col) :+ col("quality") :+ col("n_tokens"): _*)
      .persist()

    outDir.foreach { dir =>
      curated.write.mode("overwrite").partitionBy("lang").parquet(dir)
    }

    val stats = CurateStats(
      docs.count(),
      afterQuality.count(),
      afterRepetition.count(),
      afterExact.count(),
      afterNear.count(),
      afterLang.count(),
      afterTokens.count(),
      curated.count())
    // intermediates are done once the funnel counts exist; the returned
    // frame keeps its own persisted output
    Seq(afterQuality, afterRepetition, afterExact, afterNear, afterLang,
      afterTokens).foreach(_.unpersist())
    (curated, stats)
  }

  /** q_curation_funnel — the WHOLE pipeline, oracle-verified: runs
    * [[curate]] with its defaults and emits the per-stage retention
    * funnel; the DuckDB oracle recomputes every stage by composing the
    * stage operators' own oracle SQL as CTEs (quality, repetition,
    * exact-dedup keepers, near-dup decision, language ID, token floor,
    * decontamination) and chains the same filters. One hash-matched
    * result proves the end-to-end composition, not just each stage.
    */
  val qCurationFunnel = graft.Q(
    "q_curation_funnel",
    (s, d) => {
      val (_, st) = curate(s, d)
      import s.implicits._
      Seq(
        (0, "input", st.nInput),
        (1, "quality", st.nAfterQuality),
        (2, "repetition", st.nAfterRepetition),
        (3, "exact_dedup", st.nAfterExactDedup),
        (4, "near_dedup", st.nAfterNearDedup),
        (5, "language", st.nAfterLanguage),
        (6, "token_floor", st.nAfterTokens),
        (7, "decontaminated", st.nCurated)
      ).toDF("stage", "stage_name", "n")
        .orderBy("stage")
    },
    Some {
      val qual = TextOps.qQualityScore.oracle.get
      val rep  = TextOps.qRepetition.oracle.get
      val ex   = Dedup.qDedupExact.oracle.get
      val near = Advanced.qDedupDecision.oracle.get
      val lang = TextOps.qLangId.oracle.get
      val tok  = TextOps.qTokenCount.oracle.get
      val cont = TextOps.qDecontaminate.oracle.get
      s"""WITH qual AS ($qual),
         |rep AS ($rep),
         |ex AS ($ex),
         |near AS ($near),
         |lang AS ($lang),
         |tok AS ($tok),
         |cont AS ($cont),
         |s1 AS (SELECT d.doc_id FROM documents d JOIN qual USING (doc_id)
         |       WHERE quality >= 0.45),
         |s2 AS (SELECT s1.doc_id FROM s1 JOIN rep USING (doc_id)
         |       WHERE coalesce(top_bigram_frac <= 0.20, true)),
         |s3 AS (SELECT s2.doc_id FROM s2
         |       JOIN (SELECT keep_id AS doc_id FROM ex) k USING (doc_id)),
         |s4 AS (SELECT s3.doc_id FROM s3
         |       JOIN (SELECT doc_id FROM near WHERE keep) nk USING (doc_id)),
         |s5 AS (SELECT s4.doc_id FROM s4 JOIN lang USING (doc_id)
         |       WHERE predicted = 'en'),
         |s6 AS (SELECT s5.doc_id FROM s5 JOIN tok USING (doc_id)
         |       WHERE n_tokens >= 10),
         |s7 AS (SELECT s6.doc_id FROM s6
         |       WHERE doc_id NOT IN (SELECT train_id FROM cont))
         |SELECT stage, stage_name, n FROM (
         |  SELECT 0 AS stage, 'input' AS stage_name,
         |    CAST(count(*) AS BIGINT) AS n FROM documents
         |  UNION ALL SELECT 1, 'quality', count(*) FROM s1
         |  UNION ALL SELECT 2, 'repetition', count(*) FROM s2
         |  UNION ALL SELECT 3, 'exact_dedup', count(*) FROM s3
         |  UNION ALL SELECT 4, 'near_dedup', count(*) FROM s4
         |  UNION ALL SELECT 5, 'language', count(*) FROM s5
         |  UNION ALL SELECT 6, 'token_floor', count(*) FROM s6
         |  UNION ALL SELECT 7, 'decontaminated', count(*) FROM s7)
         |ORDER BY stage""".stripMargin
    }
  )

  val all: Seq[graft.Q] = Seq(qCurationFunnel)

  def main(args: Array[String]): Unit = {
    val sfDir  = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (_, stats) = curate(spark, sfDir, outDir)
    println(s"curate: $stats")
    spark.stop()
  }
}
