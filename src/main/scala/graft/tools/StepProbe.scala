package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ad-hoc step timing for the two pair-median stats queries — where
  * does the wall time actually go (scan? checkpoint? cum-sum? tail?).
  */
object StepProbe {
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
    val d = sf

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"== theil_sen round $round ==")
      val byday = graft.Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("rev"))
      val w = Window.orderBy("day")
      val idx = t("idx checkpoint") {
        byday.withColumn("t", row_number().over(w).cast("long"))
          .localCheckpoint()
      }
      val tDays  = t("count")(idx.count())
      val nPairs = tDays * (tDays - 1) / 2
      val b = idx.select(col("t").as("t2"), col("rev").as("r2"))
      val slopes = idx
        .select(col("t").as("t1"), col("rev").as("r1"),
          explode(when(col("t") < lit(tDays),
            sequence(col("t") + 1, lit(tDays)))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))).as("t2"))
        .join(broadcast(b), "t2")
        .withColumn("dr", col("r2") - col("r1"))
        .withColumn("dt", col("t2") - col("t1"))
        .withColumn("mag",
          expr("CAST((CAST(abs(dr) AS DECIMAL(38,0)) * 1000000) div dt AS BIGINT)"))
        .withColumn("slope_ppm",
          when(col("dr") >= 0, col("mag")).otherwise(-col("mag")))
      t("slopes noop") {
        slopes.select(col("slope_ppm")).write.format("noop")
          .mode("overwrite").save()
      }
      val cum = t("globalCumSum build (incl. ranged checkpoint + collect)") {
        graft.ops.Distributed.globalCumSum(
          slopes.select(col("slope_ppm")), Seq(col("slope_ppm")), lit(1L),
          "cum")
      }
      t("tail") {
        cum.filter(col("cum") * 2 >= lit(nPairs))
          .orderBy("slope_ppm").limit(1)
          .select(col("slope_ppm").as("median_slope_ppm"),
            lit(nPairs).as("n_pairs"), lit(tDays).as("n_days"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    (1 to 2).foreach { round =>
      println(s"== mad_outliers round $round ==")
      val byV = t("byV checkpoint") {
        graft.Tables.lineitem(s, d)
          .select(col("l_returnflag").as("g"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .groupBy(col("g"), col("cents"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
      }
      def lowerMedianW(df: org.apache.spark.sql.DataFrame, vc: String) = {
        val w = Window.partitionBy("g").orderBy(vc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("g")
        df.withColumn("cum", sum(col("n")).over(w))
          .withColumn("tot", sum(col("n")).over(wAll))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("g").agg(min(col(vc)).as("med"))
      }
      val med = lowerMedianW(byV, "cents")
      t("med noop") {
        med.write.format("noop").mode("overwrite").save()
      }
      val devW = byV.join(broadcast(med), "g")
        .select(col("g"), abs(col("cents") - col("med")).as("dev"),
          col("n"))
        .groupBy("g", "dev").agg(sum(col("n")).as("n"))
      val mad = lowerMedianW(devW, "dev")
        .withColumnRenamed("med", "mad")
      t("full noop") {
        devW.join(broadcast(med), "g").join(broadcast(mad), "g")
          .groupBy("g")
          .agg(max(col("med")).as("med_cents"),
            max(col("mad")).as("mad_cents"),
            sum(when(col("dev") * 10000 > col("mad") * 44478, col("n"))
              .otherwise(0L)).as("n_outliers"),
            sum(col("n")).as("n_rows"))
          .orderBy("g")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
