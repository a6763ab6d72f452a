package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * The driver contract (see /root/repo/SURVEY.md §7 and Verify.scala):
  * `fn(spark, sfDir)` runs on the driver-provided parquet tables under
  * `sfDir`; `oracle` is equivalent ANSI SQL that DuckDB executes on the
  * same tables. Queries without an oracle get a weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Headline benchmark query (run by Bench.scala at sf0.1). */
    bench: Boolean = false
)

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.parquet's `ts` column has shipped in two physical forms:
    * TIMESTAMP(NANOS) — which Spark 4 rejects unless read as a raw
    * nanosecond long via the legacy conf — and plain µs timestamps,
    * which Spark reads natively (as TIMESTAMP_NTZ). This exposes the
    * file's physical schema either way; streaming readers need this
    * form because their declared read schema must match the file.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** True when `df`'s ts column is the legacy raw-nanosecond BIGINT
    * form (TIMESTAMP(NANOS) fixtures under the nanosAsLong conf).
    */
  def tsIsRawNs(df: DataFrame): Boolean =
    df.schema("ts").dataType == org.apache.spark.sql.types.LongType

  /** events.ts, from either physical form, as epoch-microseconds
    * BIGINT — the same µs value DuckDB sees reading the file (ns
    * fixtures floor-truncate exactly like DuckDB's ns→µs read).
    */
  def tsMicros(df: DataFrame): Column = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    if (tsIsRawNs(df)) expr("ts div 1000")
    else unix_micros(col("ts").cast("timestamp"))
  }

  /** A ts literal at `us` epoch-microseconds whose type matches `df`'s
    * physical ts column — parquet written from it is readable under the
    * same declared schema as the original file (sentinel writers).
    * Session tz is pinned UTC so the NTZ cast is value-preserving.
    */
  def tsLiteral(df: DataFrame, us: Long): Column = {
    import org.apache.spark.sql.functions.{expr, lit}
    if (tsIsRawNs(df)) lit(us * 1000L)
    else expr(s"timestamp_micros(${us}L)").cast("timestamp_ntz")
  }

  /** events with ts normalized to a microsecond TimestampType — for the
    * ns fixtures the same ns→µs truncation DuckDB applies reading the
    * file; for µs fixtures a value-preserving NTZ→LTZ cast (UTC session
    * tz) — so oracle comparisons line up exactly in both cases.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = eventsRaw(s, d)
    if (tsIsRawNs(raw))
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}

/** Process-scoped scratch directories for queries that round-trip
  * through a filesystem sink (curated writes, streaming file sinks).
  *
  * Disk usage is bounded two ways: within a process the path for a
  * given `name` is stable and cleared per call (re-running a query
  * overwrites its previous output instead of accumulating temp dirs),
  * and the whole root is recursively deleted on JVM exit. The root
  * itself is a fresh per-process temp dir — a fixed shared path would
  * let concurrent graft JVMs clear each other's live streaming state.
  */
object Scratch {
  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }

  private val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    sys.addShutdownHook(rm(p.toFile))
    p
  }

  /** A stable-within-process scratch dir for `name`, cleared of any
    * previous contents.
    */
  def dir(name: String): java.nio.file.Path = {
    val p = root.resolve(name)
    rm(p.toFile)
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** The path [[dir]] would return, WITHOUT clearing it — for specs
    * inspecting what a query just wrote.
    */
  def peek(name: String): java.nio.file.Path = root.resolve(name)
}

/** Cross-engine deterministic numeric helpers.
  *
  * Summing IEEE doubles is order-dependent, so a Spark shuffle-order sum
  * and a DuckDB sequential sum can differ in the last ULP and break the
  * driver's hash compare. We instead aggregate exact DECIMAL(18,2) values
  * (order-independent) and cast the final result to double — both engines
  * then produce bit-identical results. Mirrors SURVEY.md §7.4 risk #2/#3.
  */
object Exact {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Column cast to exact decimal for order-independent aggregation. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum surfaced as double (matches `CAST(SUM(CAST(x AS
    * DECIMAL(18,2))) AS DOUBLE)` in the oracle).
    */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
