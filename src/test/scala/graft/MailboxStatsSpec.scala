package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.source.{Mailbox, MailboxGen, MailboxIndex}

/** Statistics-backed MIN/MAX aggregate pushdown (v3 sidecars): the
  * fast path answers from per-class delivery-time stats with ONE static
  * partition and zero execution IO; every inexact situation (stale
  * sidecar, foreign layout with the timestamp beyond the record head)
  * falls back to the ordinary scan and stays correct.
  */
class MailboxStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("mailbox-stats-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  private def fixtures: String = {
    val dir = new File("fixtures/mailbox")
    if (!new File(dir, "unittest.mbx.idx").exists())
      MailboxGen.writeFixtures(dir)
    dir.getAbsolutePath
  }

  /** Did the aggregate collapse to the stats-answered static partition?
    * The scan's A12 description — printed by BatchScanExec even under
    * AQE — reflects the pushedStats state; when pushed, the BatchScan's
    * output must be the aggregate columns (no data columns survive).
    */
  private def statsPushed(df: DataFrame): Boolean = {
    val plan   = df.queryExecution.executedPlan.toString
    val pushed = plan.contains("statsAggPushdown=true")
    if (pushed)
      assert(plan.contains("BatchScan") &&
        (plan.contains("min(message_delivery_time)#") ||
          plan.contains("max(message_delivery_time)#")), plan)
    pushed
  }

  import org.apache.spark.sql.functions._

  test("whole-glob min/max/count collapses to one static stats partition") {
    val glob = s"$fixtures/*.mbx"
    val agg = Mailbox.messages(spark, glob)
      .agg(min(col("message_delivery_time")).as("mn"),
        max(col("message_delivery_time")).as("mx"),
        count(lit(1)).as("n"))
    assert(statsPushed(agg), agg.queryExecution.executedPlan.toString)
    // cross-check against the scanned column (projection path, no agg
    // pushdown involved)
    val times = Mailbox.messages(spark, glob)
      .select(col("message_delivery_time")).collect().map(_.getTimestamp(0))
    val row = agg.collect()(0)
    assert(row.getTimestamp(0) == times.min, row.toString)
    assert(row.getTimestamp(1) == times.max, row.toString)
    assert(row.getLong(2) == times.length.toLong, row.toString)
  }

  test("typed-mode (plan-time class filtered) min/max answers from per-class stats") {
    val glob = s"$fixtures/*.mbx"
    val agg = Mailbox.tasks(spark, glob)
      .agg(min(col("message_delivery_time")).as("mn"),
        max(col("message_delivery_time")).as("mx"))
    assert(statsPushed(agg), agg.queryExecution.executedPlan.toString)
    val times = Mailbox.tasks(spark, glob)
      .select(col("message_delivery_time")).collect().map(_.getTimestamp(0))
    val row = agg.collect()(0)
    assert(row.getTimestamp(0) == times.min && row.getTimestamp(1) == times.max)
  }

  test("stale sidecar falls back to the scan and stays correct") {
    val dir = Files.createTempDirectory("mbx-stale").toFile
    MailboxGen.writeFile(new File(dir, "a.mbx"),
      MailboxGen.syntheticLines(2, 40, 1))
    // stale: rewrite the data after the sidecar was written
    MailboxGen.writeFile(new File(dir, "a.mbx"),
      MailboxGen.syntheticLines(2, 50, 2), writeIndex = false)
    val agg = Mailbox.messages(spark, s"$dir/a.mbx")
      .agg(min(col("message_delivery_time")).as("mn"), count(lit(1)).as("n"))
    assert(!statsPushed(agg), "stale stats must NOT answer the aggregate")
    val times = Mailbox.messages(spark, s"$dir/a.mbx")
      .select(col("message_delivery_time")).collect().map(_.getTimestamp(0))
    val row = agg.collect()(0)
    assert(row.getTimestamp(0) == times.min && row.getLong(1) == times.length)
  }

  test("all-null delivery times push down as a NULL result") {
    val dir = Files.createTempDirectory("mbx-null").toFile
    val lines = (0 until 3).map { i =>
      s"""{"node_id":${100 + i},"parent_node_id":1,"record_type":"message","message_class":"IPM.Note","record_key":"AA==","creation_time":5,"last_modified":6,"message_delivery_time":null,"subject":"s$i","body":"b"}"""
    }
    MailboxGen.writeFile(new File(dir, "n.mbx"), lines)
    val agg = Mailbox.messages(spark, s"$dir/n.mbx")
      .agg(min(col("message_delivery_time")).as("mn"), count(lit(1)).as("n"))
    assert(statsPushed(agg), agg.queryExecution.executedPlan.toString)
    val row = agg.collect()(0)
    assert(row.isNullAt(0) && row.getLong(1) == 3L, row.toString)
  }

  test("foreign layout (timestamp beyond the record head) refuses pushdown") {
    val dir = Files.createTempDirectory("mbx-foreign").toFile
    val pad = "x" * 400 // pushes the timestamp past HeadBytes
    val lines = (0 until 3).map { i =>
      s"""{"node_id":${200 + i},"parent_node_id":1,"record_type":"message","message_class":"IPM.Note","record_key":"AA==","subject":"$pad","message_delivery_time":${1000 + i},"body":"b"}"""
    }
    MailboxGen.writeFile(new File(dir, "f.mbx"), lines)
    val agg = Mailbox.messages(spark, s"$dir/f.mbx")
      .agg(min(col("message_delivery_time")).as("mn"),
        max(col("message_delivery_time")).as("mx"))
    assert(!statsPushed(agg),
      "inconclusive head stats must NOT answer the aggregate")
    val row = agg.collect()(0)
    assert(row.getTimestamp(0).toInstant.getEpochSecond == 1000L &&
      row.getTimestamp(1).toInstant.getEpochSecond == 1002L, row.toString)
  }

  test("deliveryOfPrefix: null, absent-in-full-line, and cut-mid-digits") {
    import MailboxIndex.deliveryOfPrefix
    assert(deliveryOfPrefix(
      """{"node_id":1,"message_delivery_time":null,"a":1}""",
      truncated = false) == Some(None))
    assert(deliveryOfPrefix(
      """{"node_id":1,"a":1}""", truncated = false) == Some(None))
    assert(deliveryOfPrefix(
      """{"node_id":1,"a":1}""", truncated = true).isEmpty)
    assert(deliveryOfPrefix(
      """{"node_id":1,"message_delivery_time":17666""",
      truncated = true).isEmpty)
    assert(deliveryOfPrefix(
      """{"node_id":1,"message_delivery_time":17666}""",
      truncated = false) == Some(Some(17666L)))
    assert(deliveryOfPrefix(
      """{"node_id":1,"message_delivery_time":-5,"a":1}""",
      truncated = true) == Some(Some(-5L)))
  }
}
