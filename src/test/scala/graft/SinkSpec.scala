package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sink-side scale behaviors: partitioned writes with partition pruning
  * on read-back, and bucketed tables joining without an exchange — the
  * two storage-layout levers for 100 TB co-located access.
  */
class SinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_warehouse").toFile.getPath
    SparkSession
      .builder()
      .master("local[4]")
      .appName("sink-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  test("partitioned parquet write prunes partitions on filtered read-back") {
    val out = Files.createTempDirectory("events_part").toFile.getPath
    Tables
      .events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write
      .partitionBy("day")
      .mode("overwrite")
      .parquet(out)

    val back = spark.read.parquet(out).filter(col("day") === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    // pruned scan reads only the one day directory
    val expected = Tables
      .events(spark, sf)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05")
      .count()
    assert(back.count() === expected)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, sf).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = spark
      .table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
