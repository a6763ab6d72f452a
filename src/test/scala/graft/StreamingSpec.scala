package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

object StreamingSpec {
  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionOut(user_id: Long, session_id: Int, n_events: Long)

  /** Gap-based sessionizer over a user's (possibly unordered) events.
    * State tracks nothing across batches here (single-batch test); the
    * API shape — iterator per key + GroupState — is the production one.
    */
  def sessionize(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[Int]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(_.event_id)
    if (sorted.isEmpty) Iterator.empty
    else {
      var session = 0
      var lastUs  = Long.MinValue
      val counts  = scala.collection.mutable.LinkedHashMap[Int, Long]()
      sorted.foreach { e =>
        if (lastUs != Long.MinValue && e.ts_us - lastUs > 1800L * 1000000L)
          session += 1
        counts(session) = counts.getOrElse(session, 0L) + 1
        lastUs = e.ts_us
      }
      state.update(session)
      counts.iterator.map { case (sid, n) => SessionOut(userId, sid, n) }
    }
  }
}

/** Structured Streaming suite: the stateful sessionization op
  * (flatMapGroupsWithState) must produce exactly the sessions of the
  * batch formulation (ops.StreamingOps.qSessionize), and the windowed
  * aggregation streaming query must match its batch equivalent.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingSpec._

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  test("flatMapGroupsWithState sessionization matches the batch oracle query") {
    import spark.implicits._
    val raw = Tables.eventsRaw(spark, sf)
    val stream = spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .select(
        col("user_id"),
        col("event_id"),
        Tables.tsMicros(raw).as("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(sessionize)

    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_stream")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark
      .table("sessions_stream")
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val batch = SparkEntry
      .queries("q_sessionize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    assert(streamed.toSeq === batch.toSeq)
  }

  test("RocksDB state store runs the stateful ops bit-identically") {
    // local[32] tests default to the in-memory HDFS-backed state store;
    // a 1000-executor deployment holding hours of watermarked state
    // runs RocksDB (state off-heap, spillable, incrementally
    // checkpointed). Same windowed aggregation, same results, under
    // the provider the real cluster would use.
    val provider =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try {
      val raw = Tables.eventsRaw(spark, sf)
      val stream = spark.readStream
        .schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
        .select(timestamp_micros(Tables.tsMicros(raw)).as("ts"),
          col("event_type"), col("value"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("day"), col("event_type"), col("n"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("rocksdb_windows")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val streamed = spark.table("rocksdb_windows")
        .orderBy("day", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val batch = Tables.events(spark, sf)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("day"), col("event_type"), col("n"))
        .orderBy("day", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.nonEmpty)
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("streaming dropDuplicates dedups re-delivered events exactly") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val dir = JFiles.createTempDirectory("stream_dedup")
    // the same archive delivered twice (at-least-once source semantics)
    JFiles.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    JFiles.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val raw = Tables.eventsRaw(spark, sf)
    val stream = spark.readStream
      .schema(raw.schema)
      .parquet(dir.toString)
      .dropDuplicates("event_id")
      .groupBy()
      .count()
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("dedup_stream")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val total = spark.table("dedup_stream").collect()(0).getLong(0)
    assert(total === raw.count(), "duplicates must be dropped exactly once")
  }

  test("stream-static join: arriving docs dedup against a static index") {
    import org.apache.spark.sql.functions.{col, md5, broadcast}
    // static side: the signature index of already-ingested documents
    val known = Tables.documents(spark, sf)
      .filter(col("doc_id") < 250)
      .select(md5(col("text")).as("known_hash"))
    val docSchema = Tables.documents(spark, sf).schema
    val stream = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
      .withColumn("h", md5(col("text")))
      .join(broadcast(known), col("h") === col("known_hash"), "left_anti")
      .groupBy()
      .count()
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_static_dedup")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val fresh = spark.table("stream_static_dedup").collect()(0).getLong(0)
    // batch equivalent: docs whose content hash is not in the index
    val expected = Tables.documents(spark, sf)
      .withColumn("h", md5(col("text")))
      .join(known, col("h") === col("known_hash"), "left_anti")
      .count()
    assert(fresh === expected)
    assert(fresh > 0 && fresh < 500)
  }

  test("streaming windowed aggregation matches batch group-by") {
    val streamed = SparkEntry.queries("q_stream_window")(spark, sf).collect()
    val batch = Tables
      .events(spark, sf)
      .groupBy(
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day", "event_type")
      .collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[java.time.LocalDateTime]("day")
        === b.getAs[java.time.LocalDateTime]("day"))
      assert(s.getAs[String]("event_type") === b.getAs[String]("event_type"))
      assert(s.getAs[Long]("n") === b.getAs[Long]("n"))
    }
  }

  test("checkpointed query restart resumes exactly-once (no loss, no dupes)") {
    // production recovery path: a streaming aggregation-free pipeline
    // writes N input files through a checkpointed file sink; the query
    // is KILLED after the first micro-batch and a new query object is
    // started on the same checkpoint — the sink must end up with every
    // input row exactly once
    val tmp    = graft.Scratch.dir("restart_spec")
    val inDir  = tmp.resolve("in");   java.nio.file.Files.createDirectories(inDir)
    val outDir = tmp.resolve("out").toString
    val ckpt   = tmp.resolve("ckpt").toString
    import spark.implicits._
    // 3 input files, 100 rows each
    for (i <- 0 until 3)
      spark.range(i * 100, (i + 1) * 100).toDF("v")
        .coalesce(1).write.parquet(inDir.resolve(s"f$i").toString)

    def start() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString + "/*")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()

    // first run: exactly one micro-batch, then hard stop
    val q1 = start()
    try {
      var waited = 0
      while (q1.recentProgress.forall(_.numInputRows == 0) && waited < 300) {
        Thread.sleep(100); waited += 1
      }
    } finally q1.stop()
    // at least one batch committed before the kill (usually exactly
    // one; a fast scheduler may get further — exactly-once across the
    // restart is what the final assert checks either way). The sink dir
    // only exists after the first commit, so probe before reading.
    val afterKill =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(outDir)))
        spark.read.parquet(outDir).count()
      else 0L
    assert(afterKill >= 100, s"no batch committed before the kill ($afterKill)")

    // recovery: new query object, same checkpoint
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()
    val rows = spark.read.parquet(outDir).select("v")
      .collect().map(_.getLong(0)).sorted
    assert(rows.length === 300, s"expected 300 exactly-once rows, got ${rows.length}")
    assert(rows.toSeq === (0L until 300L))
  }

  test("observe() metrics report per-batch rows and sums on a stream") {
    // the observability surface (A11-adjacent): named metrics attached
    // to the stream are reported per micro-batch via QueryProgress
    // without a separate counting pass
    val raw = Tables.eventsRaw(spark, sf)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("ingest")
        if (m != null) seen.addAndGet(m.getAs[Long]("rows")): Unit
      }
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
        .observe("ingest", count(lit(1)).as("rows"),
          sum(col("value").cast("double")).as("total_value"))
        .writeStream.format("noop").start()
      try q.processAllAvailable()
      finally q.stop()
      // listener delivery is async; wait for the metric to arrive
      var waited = 0
      while (seen.get() < raw.count() && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      assert(seen.get() === raw.count(),
        "observed row metric must equal the full input count")
    } finally spark.streams.removeListener(listener)
  }

  test("per-row stream bands are bit-identical to batch signatures") {
    // the invariant q_stream_neardup rests on: the stateless per-row
    // MinHash banding (stream side) and the explode+min-aggregate
    // batch signatures (corpus index) must produce the same key space
    import graft.ops.{Dedup, StreamingOps}
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getString(2))
    val perRow = StreamingOps
      .perRowBands(Tables.documents(spark, sf))
      .collect().map(key).sortBy(identity)
    val sig = Dedup.signatures(spark, sf)
    val batch = sig
      .select(col("doc_id"), lit(0).as("band"), col("b0").as("bv"))
      .union(sig.select(col("doc_id"), lit(1).as("band"), col("b1").as("bv")))
      .collect().map(key).sortBy(identity)
    assert(perRow.length === batch.length)
    assert(perRow.toSeq === batch.toSeq)
  }

  test("checkpointed file sink is exactly-once across a mid-stream restart") {
    // the recovery contract every streaming query here relies on: kill
    // a query after its first micro-batch, restart from the SAME
    // checkpoint, and the sink must hold each input row exactly once —
    // no loss (batch 1 not reprocessed-and-skipped) and no duplication
    // (batch 0 not re-emitted)
    import java.nio.file.{Files, StandardCopyOption}
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val tmp = Files.createTempDirectory("eo_spec")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
        mtimeSec: Long): Unit = {
      val stage = tmp.resolve(name + "_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = inDir.resolve(name + ".parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
    }
    writeBatch(ev.filter(col("event_id") % 2 === 0), "b1", 1000000L)
    writeBatch(ev.filter(col("event_id") % 2 =!= 0), "b2", 1000100L)
    val outDir = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString
    def start() = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    // run exactly one micro-batch, then stop (simulated failure)
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(q1.recentProgress.exists(_.numInputRows > 0), "first batch ran")
    } finally q1.stop()
    // restart from the same checkpoint; it must finish the rest only
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()
    val sunk = spark.read.parquet(outDir).select("event_id").collect()
      .map(_.getLong(0)).sorted
    val expected = ev.select("event_id").collect().map(_.getLong(0)).sorted
    assert(sunk.length === expected.length,
      s"exactly-once violated: ${sunk.length} vs ${expected.length}")
    assert(sunk.toSeq === expected.toSeq)
  }

  test("q_stream_merge: incremental upserts equal the one-shot aggregate") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_stream_merge")(spark, sf).collect()
    // independent batch recompute of the same profile
    val ev = Tables.events(spark, sf).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val expected = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"),
        max(struct(col("ts_us"), col("event_id"), col("event_type")))
          .as("last"))
      .select(col("user_id"), col("n_events"), col("total_cents"),
        col("last.ts_us"), col("last.event_id"), col("last.event_type"))
      .orderBy("user_id").collect()
    assert(got.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
  }

  test("q_stream_session_timer agrees with the batch window sessionization") {
    val timer = SparkEntry.queries("q_stream_session_timer")(spark, sf)
      .collect()
    // q_sessionize breaks on event_id order, the timer variant on
    // (ts, event_id); the session COUNT per user must agree whenever
    // event_id order is ts order per user (true of this fixture), and
    // every event lands in exactly one session either way
    val batch = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    assert(timer.map(_.getAs[Long]("n_events")).sum ===
      batch.map(_.getAs[Long]("n_events")).sum, "events partition")
    assert(timer.length === batch.length, "session count")
    // sessions are disjoint, ordered, and gap-separated per user
    timer.groupBy(_.getAs[Long]("user_id")).values.foreach { ss =>
      val sorted = ss.sortBy(_.getAs[Long]("start_us"))
      sorted.foreach(s0 => assert(
        s0.getAs[Long]("start_us") <= s0.getAs[Long]("end_us")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") >
            1800L * 1000000L, "gap separation violated")
        case _ =>
      }
    }
  }

  test("q_stream_hll: streamed sketch equals the batch aggregate per day") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.graft_hll
    val streamed = SparkEntry.queries("q_stream_hll")(spark, sf).collect()
      .map(r => r.getAs[java.time.LocalDateTime]("day") ->
        r.getAs[Long]("hll_users")).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .agg(graft_hll(col("user_id").cast("string")).as("hll_users"))
      .collect()
      .map(r => r.getAs[java.time.LocalDateTime]("day") ->
        r.getAs[Long]("hll_users")).toMap
    // register max is batching-independent, so streaming == batch
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_kmv: streamed sketch equals the batch aggregate per day") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.graft_kmv_median
    val streamed = SparkEntry.queries("q_stream_kmv")(spark, sf).collect()
      .map(r => r.getAs[java.time.LocalDateTime]("day") ->
        r.getAs[Long]("kmv_med")).toMap
    val batch = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("day")
      .agg(graft_kmv_median(col("cents")).as("kmv_med"))
      .collect()
      .map(r => r.getAs[java.time.LocalDateTime]("day") ->
        r.getAs[Long]("kmv_med")).toMap
    // hash-min selection is batching-independent: streaming == batch
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_drift: streamed TV distance equals a brute-force recompute") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_stream_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("event_type"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getString(1)))
    val n = evs.length.toLong
    val ref = evs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byDay = evs.groupBy(_._1)
    assert(rows.length === byDay.size)
    rows.foreach { r =>
      val day = r.getAs[java.time.LocalDateTime]("day")
      val dayEvs = byDay(day)
      val nd = dayEvs.length.toLong
      assert(r.getAs[Long]("n_day") === nd, day.toString)
      // TV over the COMPLETE type grid: absent types contribute n_d·n_t
      val tvNum = ref.map { case (t, nt) =>
        (BigInt(dayEvs.count(_._2 == t)) * n - BigInt(nd) * nt).abs
      }.sum
      val expect = tvNum * 1000000 / (BigInt(2) * nd * n)
      assert(BigInt(r.getAs[Long]("drift_ppm")) === expect, day.toString)
      assert(r.getAs[Long]("drift_ppm") <= 1000000L, day.toString)
    }
  }
}
