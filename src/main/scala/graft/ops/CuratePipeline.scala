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
