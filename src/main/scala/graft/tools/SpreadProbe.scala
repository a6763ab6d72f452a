package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the single-row-group scan bottleneck: the fixture parquet
  * files hold ONE row group each, so a scan-fused compute stage
  * (md5 chains, tokenization) can only run on ONE task no matter how
  * many cores the session has. Prints per-partition row counts for the
  * raw scan and the timed cost of an md5-heavy stage with and without
  * a round-robin spread after the read (guide §2.5 "input skew: one
  * huge unsplittable file — repartition immediately after the read").
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val perPart = orders.select(lit(1).as("one"))
      .mapPartitions(it => Iterator.single(it.size)).collect()
    println(s"scan partitions: ${perPart.length}, " +
      s"non-empty: ${perPart.count(_ > 0)}, rows: ${perPart.sum}, " +
      s"max: ${perPart.max}")

    def heavy(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderkey"),
        explode(sequence(lit(0), lit(31))).as("r"))
      .select(conv(substring(md5(concat(col("o_orderkey").cast("string"),
        lit(":"), col("r").cast("string"))), 1, 8), 16, 10)
        .cast("long").as("u"))
      .agg(sum(col("u")))

    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // warm
    heavy(orders).write.format("noop").mode("overwrite").save()
    time("fused-on-scan") {
      heavy(orders).write.format("noop").mode("overwrite").save()
    }
    time("spread-first") {
      heavy(orders.repartition(cpus.toInt))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
