package graft

import java.io.{File, InputStream}
import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.MailboxSchema
import graft.source._

/** Local filesystem re-registered under the `cfs:` scheme with byte-read
  * accounting — proves (a) the connector works over an arbitrary Hadoop
  * FileSystem scheme (A19) and (b) planning reads O(#files) metadata
  * bytes, not the corpus (the reference plans from the PST index without
  * reading message content, table_function.cpp:100-212).
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cfs"
  override def getUri: URI = URI.create("cfs:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(new CountingStream(super.open(f, bufferSize)))
}

object CountingFileSystem {
  val bytesRead = new AtomicLong(0L)
}

class CountingStream(inner: FSDataInputStream)
    extends InputStream with Seekable with PositionedReadable {
  private def add(n: Long): Unit =
    if (n > 0) CountingFileSystem.bytesRead.addAndGet(n)
  override def read(): Int = { val b = inner.read(); if (b >= 0) add(1); b }
  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    val n = inner.read(buf, off, len); add(n); n
  }
  override def seek(pos: Long): Unit = inner.seek(pos)
  override def getPos: Long = inner.getPos
  override def seekToNewSource(target: Long): Boolean = inner.seekToNewSource(target)
  override def read(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
    val n = inner.read(pos, buf, off, len); add(n); n
  }
  override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
    inner.readFully(pos, buf, off, len); add(len)
  }
  override def readFully(pos: Long, buf: Array[Byte]): Unit = {
    inner.readFully(pos, buf); add(buf.length)
  }
  override def close(): Unit = inner.close()
}

/** Scale-behavior suite for the mailbox connector: O(#files) planning,
  * byte-range fallback correctness, custom scan metrics, UTF-16
  * truncation fidelity.
  */
class MailboxScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var dir: File = _

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("mailbox-scale-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("mailbox_scale").toFile
    MailboxGen.writeFixtures(dir)
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingFileSystem].getName)
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  private def cfsGlob: String = s"cfs:${dir.getPath}/*.mbx"

  test("scan works through a non-local Hadoop FileSystem scheme (A19)") {
    val df = Mailbox.messages(spark, cfsGlob)
    assert(df.count() === 812L)
    val subjects = Mailbox.notes(spark, s"cfs:${new File(dir, "unittest.mbx").getPath}")
      .select("subject").collect().map(_.getString(0)).sorted
    assert(subjects.head === "Test mail 1")
  }

  test("planning reads O(#files) metadata bytes, never the corpus") {
    val dataBytes = dir.listFiles().filter(_.getName.endsWith(".mbx")).map(_.length()).sum
    assert(dataBytes > 500000L, "fixture corpus unexpectedly small")

    CountingFileSystem.bytesRead.set(0L)
    val df = Mailbox.messages(spark, cfsGlob)
    // force planning (partition enumeration + statistics), no execution
    df.queryExecution.executedPlan.toString
    assert(df.queryExecution.optimizedPlan.stats.rowCount.exists(_.toLong == 812L))
    val planningBytes = CountingFileSystem.bytesRead.get()
    assert(planningBytes > 0L, "expected sidecar reads during planning")
    assert(planningBytes < dataBytes / 20,
      s"planning read $planningBytes bytes of a $dataBytes-byte corpus — not O(#files)")

    // count(*) stays metadata-only end to end (A9): zero data-page IO
    CountingFileSystem.bytesRead.set(0L)
    val cnt = Mailbox.messages(spark, cfsGlob).groupBy().count().collect()(0).getLong(0)
    assert(cnt === 812L)
    val countBytes = CountingFileSystem.bytesRead.get()
    assert(countBytes < dataBytes / 20,
      s"count(*) read $countBytes bytes — should be answered from the index")
  }

  test("unindexed files fall back to byte-range splits with boundary discovery") {
    val rdir = Files.createTempDirectory("mailbox_range").toFile
    // long bodies → multi-partition at a 64 KiB range size
    val lines = MailboxGen.syntheticLines(4, 800, 7)
    MailboxGen.writeFile(new File(rdir, "plain.mbx"), lines, writeIndex = false)
    val df = Mailbox.messages(spark, new File(rdir, "plain.mbx").getPath,
      Map("partition_bytes" -> "65536"))
    assert(df.rdd.getNumPartitions > 1,
      s"expected multiple byte-range splits, got ${df.rdd.getNumPartitions}")
    // no record lost or duplicated across split boundaries
    assert(df.count() === 800L)
    assert(df.select("node_id").distinct().count() === 800L)
    // count(*) pushdown still works distributed (classify-only scan)
    val cnt = df.groupBy().count().collect()(0).getLong(0)
    assert(cnt === 800L)
  }

  test("mixed glob: indexed and unindexed files in one scan") {
    val mdir = Files.createTempDirectory("mailbox_mixed").toFile
    MailboxGen.writeFile(new File(mdir, "indexed.mbx"),
      MailboxGen.syntheticLines(2, 100, 1))
    MailboxGen.writeFile(new File(mdir, "plain.mbx"),
      MailboxGen.syntheticLines(2, 60, 2), writeIndex = false)
    val df = Mailbox.messages(spark, new File(mdir, "*.mbx").getPath)
    assert(df.count() === 160L)
    // node_id spaces overlap across files — identity is (file, node_id)
    assert(df.select("pst_name", "node_id").distinct().count() === 160L)
    // read_limit stays exact: indexed allocation + bounded enumeration
    val limited = Mailbox.messages(spark, new File(mdir, "*.mbx").getPath,
      Map("read_limit" -> "130"))
    assert(limited.count() === 130L)
  }

  test("stale sidecar (size mismatch) is ignored, scan stays correct") {
    val sdir = Files.createTempDirectory("mailbox_stale").toFile
    val f = new File(sdir, "grow.mbx")
    MailboxGen.writeFile(f, MailboxGen.syntheticLines(2, 50, 3))
    // file grows after indexing → sidecar is stale
    val w = new java.io.FileWriter(f, true)
    try MailboxGen.syntheticLines(0, 10, 9).foreach(l => w.write(l + "\n"))
    finally w.close()
    val df = Mailbox.messages(spark, f.getPath)
    assert(df.count() === 60L)
  }

  test("custom scan metrics report rows/bytes/files read (A11)") {
    val scan = new MailboxScan(
      MailboxOptions(Map("path" -> new File(dir, "unittest.mbx").getPath)),
      MailboxSchema.schemaFor(MailboxSchema.Mode.Messages),
      RecordFilter(MailboxSchema.Mode.Messages), None, countStar = false)
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ===
      Set("mailboxRowsRead", "mailboxBytesRead", "mailboxFilesRead"))

    val conf = spark.sessionState.newHadoopConf()
    val part = IndexedPartition(0, new File(dir, "unittest.mbx").getPath, 0L, 0L, 12L,
      firstInFile = true)
    val reader = new MailboxPartitionReader(part,
      MailboxSchema.schemaFor(MailboxSchema.Mode.Messages),
      MailboxOptions(Map("path" -> new File(dir, "unittest.mbx").getPath)),
      RecordFilter(MailboxSchema.Mode.Messages), conf)
    var rows = 0
    while (reader.next()) rows += 1
    val metrics = reader.currentMetricsValues().map(m => m.name() -> m.value()).toMap
    reader.close()
    assert(rows === 12)
    assert(metrics("mailboxRowsRead") === 12L)
    assert(metrics("mailboxBytesRead") > 0L)
    assert(metrics("mailboxFilesRead") === 1L)
  }

  test("UTF-16 byte-budget truncation never splits a surrogate pair") {
    // BMP: 100-byte budget = 50 chars (table_function_parameters.test:19-28)
    assert(MailboxText.truncateUtf16("a" * 80, 100) === "a" * 50)
    assert(MailboxText.truncateUtf16("short", 100) === "short")
    assert(MailboxText.truncateUtf16("anything", 0) === "anything") // 0 = read all
    // astral plane: U+1F600 is 2 code units (4 bytes); a budget landing
    // between the surrogates drops the whole character
    val emoji = "😀" // 😀
    val s = emoji * 10
    val cut = MailboxText.truncateUtf16(s, 10) // 5 units → mid-pair
    assert(cut === emoji * 2, "expected back-off to the pair boundary")
    assert(!Character.isHighSurrogate(cut.last))
    val even = MailboxText.truncateUtf16(s, 8) // 4 units → clean boundary
    assert(even === emoji * 2)

    // end-to-end through the reader
    val tdir = Files.createTempDirectory("mailbox_utf16").toFile
    val line = """{"node_id":1,"parent_node_id":0,"record_type":"message","message_class":"IPM.Note","body":"""" +
      "\\ud83d\\ude00" * 10 + """"}"""
    MailboxGen.writeFile(new File(tdir, "t.mbx"), Seq(line))
    val body = Mailbox.messages(spark, new File(tdir, "t.mbx").getPath,
      Map("read_body_size_bytes" -> "10"))
      .select("body").collect()(0).getString(0)
    assert(body === emoji * 2)
  }

  test("streaming offsets with multiple files per batch survive restart") {
    val sdir = Files.createTempDirectory("mailbox_multioffset_src").toFile
    val ckpt = Files.createTempDirectory("mailbox_multioffset_ckpt").toFile.getPath
    val out  = Files.createTempDirectory("mailbox_multioffset_out").toFile.getPath
    // TWO files in the first committed offset: the offset JSON must stay
    // single-line or OffsetSeqLog splits it on restart
    MailboxGen.writeFile(new File(sdir, "a.mbx"), MailboxGen.unittestLines)
    MailboxGen.writeFile(new File(sdir, "b.mbx"), MailboxGen.syntheticLines(2, 30, 5))

    def startQuery() = spark.readStream
      .format("mailbox")
      .option("mode", "messages")
      .load(new File(sdir, "*.mbx").getPath)
      .select("pst_name", "node_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet")
      .option("path", out)
      .start()

    val q1 = startQuery()
    try q1.processAllAvailable()
    finally q1.stop()
    assert(spark.read.parquet(out).count() === 42L)

    MailboxGen.writeFile(new File(sdir, "c.mbx"), MailboxGen.syntheticLines(2, 20, 6))
    val q2 = startQuery()
    try q2.processAllAvailable()
    finally q2.stop()
    val perFile = spark.read.parquet(out).groupBy("pst_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perFile === Map("a.mbx" -> 12L, "b.mbx" -> 30L, "c.mbx" -> 20L),
      s"restart mis-restored the multi-file offset: $perFile")
  }

  test("distributed indexing job writes sidecars for a whole corpus") {
    val idir = Files.createTempDirectory("mailbox_indexall").toFile
    (0 until 4).foreach { i =>
      MailboxGen.writeFile(new File(idir, s"p$i.mbx"),
        MailboxGen.syntheticLines(2, 40, i), writeIndex = false)
    }
    assert(MailboxIndex.indexAll(spark, new File(idir, "*.mbx").getPath) === 4L)
    assert(idir.listFiles().count(_.getName.endsWith(".mbx.idx")) === 4)
    // indexed now: exact stats
    val df = Mailbox.messages(spark, new File(idir, "*.mbx").getPath)
    assert(df.queryExecution.optimizedPlan.stats.rowCount.exists(_.toLong == 160L))
  }
}
