package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries
  * (Q.bench) on SPARK_GRAFT_SF_DIR and prints one JSON line with
  * per-query and total wall seconds.
  *
  * Queries execute into the noop sink so the full plan — including
  * sorts and exchanges — runs (a bare count() would let Catalyst drop
  * the ordering work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(q: Q): Unit =
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val bench = SparkEntry.benchQueries
    // JVM/codegen warmup on the smallest fixture so timings reflect the
    // engine, not first-call class loading
    bench.foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // min of two runs: steady-state engine time, less scheduler noise
    val results = bench.map { q =>
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        try run(q)
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
