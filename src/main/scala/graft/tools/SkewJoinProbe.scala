package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures [[graft.ops.Distributed.modelJoin]]'s SHUFFLE arm (the
  * above-gate arm) under Zipfian probe-key skew — the r12 verdict's
  * "the arm that fires above 10⁶ rows is unmeasured under key skew"
  * companion to ModelJoinProbe:
  *
  *  - BUILD side: the model-shaped frame at 4·10⁶ rows — ABOVE the
  *    measured 10⁶ gate, so production takes the shuffle arm.
  *  - PROBE side: 2·10⁷ rows whose key RANKS are Zipf(1)-distributed
  *    over the model's key space via inverse-CDF sampling
  *    (rank = ⌊N^u⌋, u uniform from a hash of the row id): the top
  *    token lands on ~1/ln N ≈ 4.6% of ALL probe rows — the "one
  *    token is a few percent of the stream" web-corpus shape. Probe
  *    rows carry the serving joins' realistic payload (a distinct
  *    doc_id BIGINT riding next to the token, exactly what the
  *    exploded-corpus side of every piece-count/NB join moves);
  *    a payload-FREE variant isolates what that payload changes.
  *
  * Configurations, and what each one isolates:
  *  1. uniform_defaults — the no-skew baseline (ModelJoinProbe shape
  *     plus payload).
  *  2. zipf_defaults — AQE defaults. At probe scale the hot partition
  *     is tens of MB, far under the default 256 MiB
  *     skewedPartitionThresholdInBytes, so the split CANNOT fire and
  *     the hot key rides one task (the max/median task columns show
  *     it). The honest null: absolute byte thresholds don't scale
  *     down to a laptop probe.
  *  3. zipf_scaled_16m — thresholds scaled to the probe (16 MiB
  *     threshold / 8 MiB advisory, the same RATIO to partition size
  *     a production shuffle has to the 256 MiB default): AQE's
  *     OptimizeSkewedJoin must now split the hot partition
  *     (`skew=true` in the final plan) and the max task falls.
  *  4. zipf_bare_scaled_16m — same thresholds, probe rows carry ONLY
  *     the token. The hot partition is ~9·10⁵ copies of one 32-char
  *     string and compresses BELOW the median partition (distinct
  *     strings), so the byte-based detector — it sizes partitions on
  *     COMPRESSED map-output bytes and requires hot > 5× median —
  *     goes blind: skew=false at every threshold while the hot task
  *     runs ~30× the median. The measured negative: byte-based skew
  *     detection undercounts repeated-identical-value partitions by
  *     their compression ratio; real serving payloads (doc_ids)
  *     restore visibility.
  *  5. zipf_salted16 — the round-4 [[graft.ops.Skew.saltedJoin]]
  *     mitigation under AQE defaults (split the hot key 16 ways,
  *     replicate the build row per salt): what manual salting buys
  *     WITHOUT threshold help, at the cost of a 16× build-side
  *     replication (6.4·10⁷-row shuffle). The measured answer to
  *     "if AQE doesn't fire, do we need to salt?".
  *
  * Run: `sbt "runMain graft.tools.SkewJoinProbe"` (no fixture needed;
  * one untimed warm run, then median of 3 per configuration; prints
  * per-config wall s, max/median task ms, and whether the final
  * adaptive plan contains a skew split).
  */
object SkewJoinProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // more partitions than cores: the hot key's RELATIVE partition
      // size is what the skew detector keys on, and production runs
      // with thousands of partitions — 200 makes median ≈ 1e5 rows vs
      // a ~9e5-row hot partition (≈9× median, past the default 5×)
      .config("spark.sql.shuffle.partitions", "200")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val modelRows = 4000000L
    val probeRows = sys.env.get("SKEWJOIN_PROBE_ROWS")
      .map(_.toLong).getOrElse(20000000L)

    def hex(c: org.apache.spark.sql.Column) =
      md5(concat(lit("t"), c.cast("string")))

    val build = spark.range(0L, modelRows, 1L, cpus.toInt)
      .select(hex(col("id")).as("token"), col("id").as("w1"),
        (col("id") * 2).as("w2"), (col("id") + 7).as("w3"))
      .localCheckpoint()
    build.count()

    val uniform = spark.range(0L, probeRows, 1L, cpus.toInt)
      .select(hex(pmod(col("id"), lit(modelRows))).as("token"),
        col("id").as("doc_id"))
    // Zipf(1) rank via inverse CDF: u ~ U(0,1) from a row-id hash,
    // rank = clamp(floor(N^u), 1, N); P(rank = r) ≈ 1/(r·lnN)
    val zipfRank = spark.range(0L, probeRows, 1L, cpus.toInt)
      .select(col("id"),
        (pmod(xxhash64(col("id")), lit(1000000000L)).cast("double")
          / 1e9).as("u"))
      .select(col("id"), least(lit(modelRows),
        greatest(lit(1L),
          floor(exp(col("u") * math.log(modelRows.toDouble)))
            .cast("long"))).as("r"))
    val zipf = zipfRank
      .select(hex(col("r") - 1).as("token"), col("id").as("doc_id"))
    val zipfBare = zipfRank.select(hex(col("r") - 1).as("token"))

    final case class TaskStats(maxMs: Long, medMs: Long)
    def listen[T](body: => T): (T, TaskStats) = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Long]
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          times.synchronized {
            times += e.taskInfo.duration
            ()
          }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val r = body
        Thread.sleep(300) // let the listener bus drain
        val s = times.synchronized(times.toVector.sorted)
        (r, TaskStats(if (s.isEmpty) 0 else s.last,
          if (s.isEmpty) 0 else s(s.length / 2)))
      } finally spark.sparkContext.removeSparkListener(l)
    }

    def gatedArm(probe: DataFrame): DataFrame =
      graft.ops.Distributed
        .modelJoin(probe, build, modelRows, Seq("token"))
        .agg(sum(col("w1")).as("s"), count(lit(1)).as("c"))

    def saltedArm(probe: DataFrame): DataFrame =
      graft.ops.Skew.saltedJoin(probe, build, "token", "token", 16)
        .agg(sum(col("w1")).as("s"), count(lit(1)).as("c"))

    def run(name: String, probe: DataFrame,
        confs: Map[String, String],
        arm: DataFrame => DataFrame = gatedArm): Unit = {
      val prev = confs.keys.map(k => k -> spark.conf.get(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        arm(probe).write.format("noop").mode("overwrite").save() // warm
        val runs = Vector.fill(3) {
          val t0 = System.nanoTime()
          val (_, ts) = listen {
            arm(probe).write.format("noop").mode("overwrite").save()
          }
          ((System.nanoTime() - t0) / 1e9, ts)
        }
        val (t, ts) = runs.sortBy(_._1).apply(1)
        val skewFired = {
          val df = arm(probe)
          df.write.format("noop").mode("overwrite").save()
          df.queryExecution.executedPlan.toString.contains("skew=true")
        }
        println(f"$name,$t%.2f,${ts.maxMs},${ts.medMs},$skewFired")
      } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    val hot = zipf.filter(col("token") === hex(lit(0))).count()
    println(s"hot_key_rows,$hot,of,$probeRows")
    println("config,wall_s,max_task_ms,median_task_ms,skew_split_fired")
    val scaled = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")
    run("uniform_defaults", uniform, Map.empty)
    run("zipf_defaults", zipf, Map.empty)
    run("zipf_scaled_16m", zipf, scaled)
    run("zipf_bare_scaled_16m", zipfBare, scaled)
    run("zipf_salted16", zipf, Map.empty, saltedArm)
    spark.stop()
  }
}
