package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step timing for q_setsim_join: where do the ~5 s go — the shingle
  * stream pin, the df/sz/rank stage, candidate generation (the PPJoin
  * cells self-join), or verification?
  */
object SetsimProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      println(s"== setsim round $round ==")
      val (toks, sz, cand) = t("candidates (incl. toks pin)") {
        graft.ops.Dedup.setsimCandidates(s, sf)
      }
      t("cand noop (prefix+PPJoin pipeline)") { noop(cand) }
      val inter = cand
        .join(toks.as("ta"), col("id_a") === col("ta.doc_id"))
        .join(toks.as("tb"),
          col("id_b") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_inter"))
      t("verification tail") {
        noop(inter
          .join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
          .select(col("id_a"), col("id_b"), col("n_inter"),
            (col("sa.sz") + col("sb.sz") - col("n_inter")).as("n_union"),
            (col("n_inter").cast("double") /
              (col("sa.sz") + col("sb.sz") - col("n_inter"))).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("id_a", "id_b"))
      }
    }
    spark.stop()
  }
}
