package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Step timing for q_deletion_vectors: write commits vs scans vs the
  * anti-join tail.
  */
object DvProbe {
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
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("SPARK_GRAFT_COMMITTER", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val d = sf
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // buckets: args override, else both the old 256-dir layout and the
    // right-sized count (bytes/4MiB clamped to [8, 256]) for an A/B
    val bucketCounts: Seq[Int] =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else {
        val bytes = graft.Tables.tableBytes(s, d, "documents")
        val adaptive =
          math.max(8L, math.min(256L, bytes / (4L * 1024 * 1024))).toInt
        Seq(256, adaptive).distinct
      }
    for (nb <- bucketCounts; round <- 1 to 2) {
      println(s"== deletion_vectors buckets=$nb round $round ==")
      val root  = graft.Scratch.dir("dv_probe")
      val data  = root.resolve("data").toString
      val dvDir = root.resolve("dv").toString
      val w = Window.partitionBy("grp").orderBy("doc_id")
      t(s"data write ($nb bucket dirs)") {
        graft.Tables.documents(s, d)
          .withColumn("grp", pmod(col("doc_id"), lit(nb)).cast("int"))
          .withColumn("_pos", (row_number().over(w) - 1).cast("long"))
          .write.partitionBy("grp").mode("overwrite").parquet(data)
      }
      val table = s.read.parquet(data)
      t("dv batch 1 write") {
        table.filter(pmod(col("doc_id"), lit(97)) === 3)
          .select("grp", "_pos")
          .write.mode("overwrite").parquet(dvDir)
      }
      t("dv batch 2 write") {
        table.filter(col("lang") === "de")
          .select("grp", "_pos")
          .write.mode("append").parquet(dvDir)
      }
      val dvRaw = s.read.parquet(dvDir)
      val dvRows = t("dv count")(dvRaw.count())
      t("anti-join tail") {
        graft.ops.Layout.applyDeletionVectors(table, dvRaw.distinct(), dvRows)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
