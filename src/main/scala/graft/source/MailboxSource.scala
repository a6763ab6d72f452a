package graft.source

import java.io.{BufferedInputStream, ByteArrayOutputStream, FileInputStream}
import java.util.Base64
import java.util.concurrent.Executors

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.MailboxSchema
import graft.model.MailboxSchema.Mode

/** Mailbox DataSource V2 — the Spark rebuild of the reference's scan
  * machinery (SURVEY.md §2 Tier A).
  *
  * `spark.read.format("mailbox").option("mode", "messages").load(glob)`
  * scans `*.mbx` mailbox dumps with:
  *  - file globbing / multi-file scan (A2), parallel per-file partition
  *    planning with exact row statistics (A3-A4; reference
  *    table_function.cpp:100-239),
  *  - plan-time message-class filtering for typed modes and for pushed
  *    `message_class = '…'` predicates (A5),
  *  - plan-time limit pushdown via `read_limit` / SupportsPushDownLimit
  *    (A6; table_function.cpp:121-131),
  *  - projection pushdown — unprojected columns are never parsed (A7;
  *    row_serializer.cpp:1211-1266),
  *  - exact cardinality statistics (A8) and count(*) pushdown answered
  *    from planning statistics without reading data (A9; the reference's
  *    COLUMN_DATA_SCAN short-circuit, query_optimizations.test:13-17),
  *  - virtual row-id columns `__partition`/`__node_id` for late
  *    materialization (A10; schema.hpp:11-17),
  *  - scan-description EXPLAIN metadata (A12; table_function.cpp:367-380),
  *  - named scan parameters `read_limit`, `read_body_size_bytes`,
  *    `read_attachment_body`, `partition_size` (A13; defaults
  *    table_function.hpp:29-31),
  *  - per-task readers with null-tolerant row serialization (A15-A18;
  *    any per-field failure yields NULL, row_serializer.cpp:1252-1263),
  *  - resilient multi-file bind — an unreadable file is logged and
  *    skipped (A20; table_function.cpp:228-235).
  *
  * Scale notes: planning is driver-side and reads only line prefixes
  * (class + offsets), one future per file like the reference's
  * std::async fan-out; readers stream their byte ranges sequentially.
  * Spark's scheduler replaces the reference's work-stealing partition
  * queue (A14) — one task per InputPartition.
  */
class MailboxSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "mailbox"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MailboxTable.schemaFor(MailboxOptions(options.asScala.toMap))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MailboxTable(MailboxOptions(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = true
}

/** Parsed scan options (A13). */
final case class MailboxOptions(raw: Map[String, String]) {
  private def get(k: String): Option[String] =
    raw.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }

  val path: String = get("path").getOrElse(
    throw new IllegalArgumentException("mailbox source requires a path"))
  val mode: Mode.Value = get("mode").map(_.toLowerCase).getOrElse("messages") match {
    case "folders"                         => Mode.Folders
    case "messages"                        => Mode.Messages
    case "notes"                           => Mode.Notes
    case "contacts"                        => Mode.Contacts
    case "appointments"                    => Mode.Appointments
    case "sticky_notes" | "stickynotes"    => Mode.StickyNotes
    case "tasks"                           => Mode.Tasks
    case "distribution_lists" | "dlists"   => Mode.DistributionLists
    case other => throw new IllegalArgumentException(s"unknown mode: $other")
  }
  // defaults mirror the reference (table_function.hpp:29-31)
  val partitionSize: Int     = get("partition_size").map(_.toInt).getOrElse(4096).max(1)
  val readLimit: Long        = get("read_limit").map(_.toLong).getOrElse(Long.MaxValue)
  val bodySizeBytes: Long    = get("read_body_size_bytes").map(_.toLong).getOrElse(1000000L)
  val readAttachmentBody: Boolean =
    get("read_attachment_body").exists(_.toBoolean)
  val virtualColumns: Boolean = get("virtual_columns").exists(_.toBoolean)
}

object MailboxTable {
  def schemaFor(opts: MailboxOptions): StructType = {
    val base = MailboxSchema.schemaFor(opts.mode)
    if (opts.virtualColumns) StructType(base ++ MailboxSchema.virtualFields)
    else base
  }
}

class MailboxTable(opts: MailboxOptions) extends Table with SupportsRead {
  override def name(): String = s"mailbox(${opts.path}, mode=${opts.mode})"
  override def schema(): StructType = MailboxTable.schemaFor(opts)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MailboxScanBuilder(opts)
}

/** One planned partition: a run of row byte-offsets within one file
  * (A4; reference PSTInputPartition, table_function.hpp:87-105).
  */
final case class MailboxInputPartition(
    index: Int,
    file: String,
    offsets: Array[Long],
    nodeIds: Array[Long]) extends InputPartition {
  def rowCount: Long = offsets.length.toLong
}

/** Driver-side planning: glob → parallel per-file enumeration →
  * fixed-size buckets with exact counts (A2-A4, A20).
  */
object MailboxPlanner {

  /** Classify a line from its prefix only (the generator guarantees
    * node_id / record_type / message_class lead the object) — the analog
    * of the reference's planning-time class lookup.
    */
  private def lineMatches(prefix: String, wantFolder: Boolean,
      classFilter: Option[String]): Boolean = {
    val isFolder = prefix.contains("\"record_type\":\"folder\"")
    if (wantFolder) isFolder
    else !isFolder && classFilter.forall(c => prefix.contains(s""""message_class":"$c""""))
  }

  private def nodeIdOf(prefix: String): Long = {
    val i = prefix.indexOf("\"node_id\":")
    if (i < 0) -1L
    else {
      val rest = prefix.substring(i + 10).takeWhile(ch => ch.isDigit || ch == '-')
      if (rest.isEmpty) -1L else rest.toLong
    }
  }

  def globFiles(pattern: String): Seq[String] = {
    val conf = new Configuration()
    val p    = new Path(pattern)
    val fs   = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    statuses.filter(_.isFile).map(_.getPath.toUri.getPath).sorted
  }

  /** Enumerate matching (offset, nodeId) pairs of one file, reading line
    * prefixes only. Throws on IO/parse issues — caller decides skip.
    */
  def planFile(file: String, wantFolder: Boolean, classFilter: Option[String],
      limit: Long): (Array[Long], Array[Long]) = {
    val offsets = new ArrayBuffer[Long]()
    val nodes   = new ArrayBuffer[Long]()
    val in      = new FileInputStream(file)
    // block-scan: read 64 KiB chunks, find newlines in a tight loop,
    // keep only the first 160 bytes of each line (enough for the
    // node_id/record_type/message_class prefix keys)
    val buf  = new Array[Byte](1 << 16)
    val head = new Array[Byte](160)
    try {
      var headLen   = 0
      var lineStart = 0L
      var abs       = 0L
      var first     = true
      var done      = false

      def processLine(): Boolean = { // returns true when limit reached
        if (headLen == 0) false
        else {
          val prefix = new String(head, 0, headLen, "UTF-8")
          val valid  = prefix.startsWith("{\"node_id\":")
          // A20 analog: a file whose first record is not mailbox-shaped
          // fails the bind entirely; later bad lines are skipped.
          if (first && !valid)
            throw new IllegalArgumentException(s"not a mailbox dump: $file")
          first = false
          if (valid && lineMatches(prefix, wantFolder, classFilter)) {
            offsets += lineStart
            nodes += nodeIdOf(prefix)
            offsets.length >= limit
          } else false
        }
      }

      while (!done) {
        val n = in.read(buf)
        if (n < 0) {
          processLine() // trailing line without newline
          done = true
        } else {
          var i = 0
          while (i < n && !done) {
            val b = buf(i)
            if (b == '\n') {
              if (processLine()) done = true
              lineStart = abs + i + 1
              headLen = 0
            } else if (headLen < 160) {
              head(headLen) = b
              headLen += 1
            }
            i += 1
          }
          abs += n
        }
      }
    } finally in.close()
    (offsets.toArray, nodes.toArray)
  }

  /** Full plan: one planning future per file (reference std::async
    * fan-out, table_function.cpp:214-239), respecting the global limit,
    * then bucket into partitions of `partitionSize` rows.
    */
  def plan(opts: MailboxOptions, classFilter: Option[String]): Seq[MailboxInputPartition] = {
    val files = globFiles(opts.path)
    val wantFolder = opts.mode == Mode.Folders
    val pool = Executors.newFixedThreadPool(math.max(1, math.min(files.length, 16)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = files.map { f =>
        Future {
          try Some(f -> planFile(f, wantFolder, classFilter, opts.readLimit))
          catch {
            case NonFatal(e) => // A20: log and skip unreadable files
              System.err.println(s"[mailbox] skipping unreadable file $f: ${e.getMessage}")
              None
          }
        }
      }
      val perFile = Await.result(Future.sequence(futures), Duration.Inf).flatten
      // apply the global limit across files in glob order, then bucket
      var remaining = opts.readLimit
      val parts     = new ArrayBuffer[MailboxInputPartition]()
      perFile.foreach { case (file, (offsets, nodes)) =>
        if (remaining > 0) {
          val take = math.min(offsets.length.toLong, remaining).toInt
          remaining -= take
          var i = 0
          while (i < take) {
            val end = math.min(i + opts.partitionSize, take)
            parts += MailboxInputPartition(parts.length, file,
              offsets.slice(i, end), nodes.slice(i, end))
            i = end
          }
        }
      }
      parts.toSeq
    } finally pool.shutdown()
  }
}

class MailboxScanBuilder(opts: MailboxOptions)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var requiredSchema: StructType = MailboxTable.schemaFor(opts)
  private var pushedClassFilter: Option[String] = MailboxSchema.planClassFilter(opts.mode)
  private var accepted: Array[Filter] = Array.empty
  private var limit: Option[Long] = None
  private var countStar: Boolean = false

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  /** A5 — `message_class = '…'` becomes a plan-time row filter (exact),
    * everything else stays residual for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("message_class", _: String)
          if MailboxSchema.isMessageMode(opts.mode) => true
      case _ => false
    }
    ok.foreach { case EqualTo(_, v: String) =>
      pushedClassFilter = pushedClassFilter match {
        // typed mode + contradicting class → impossible, matches nothing
        case Some(existing) if existing != v => Some("<contradiction>")
        case _                               => Some(v)
      }
    }
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pushLimit(l: Int): Boolean = {
    limit = Some(math.min(l.toLong, opts.readLimit))
    true // exact: planning stops enumerating at the limit (A6)
  }

  /** A9 — count(*) with no grouping is answered from planning statistics;
    * partial pushdown: each partition emits its exact count, Spark sums.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val onlyCountStar = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (onlyCountStar && limit.isEmpty) { countStar = true; true } else false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = false

  override def build(): Scan =
    new MailboxScan(opts, requiredSchema, pushedClassFilter, limit, countStar)
}

class MailboxScan(
    opts: MailboxOptions,
    requiredSchema: StructType,
    classFilter: Option[String],
    limit: Option[Long],
    countStar: Boolean) extends Scan with Batch with SupportsReportStatistics {

  private lazy val partitions: Seq[MailboxInputPartition] = {
    val effective = limit match {
      case Some(l) => MailboxOptions(opts.raw + ("read_limit" ->
        math.min(l, opts.readLimit).toString))
      case None => opts
    }
    MailboxPlanner.plan(effective, classFilter)
  }

  override def readSchema(): StructType =
    if (countStar) StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    else requiredSchema

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MailboxMicroBatchStream(opts, requiredSchema, classFilter)

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new MailboxReaderFactory(readSchema(), opts, countStar)

  /** A8 — exact cardinality from planning statistics. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = partitions.map(_.rowCount).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * 512L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  /** A12 — EXPLAIN metadata, mirroring PSTDynamicToString. */
  override def description(): String = {
    val files = partitions.map(_.file).distinct
    s"mailbox mode=${opts.mode} files=${files.length} " +
      s"partitions=${partitions.length} rows=${partitions.map(_.rowCount).sum}" +
      (if (countStar) " countStarPushdown=true" else "") +
      limit.map(l => s" limit=$l").getOrElse("") +
      classFilter.map(c => s" classFilter=$c").getOrElse("")
  }
}

class MailboxReaderFactory(
    readSchema: StructType,
    opts: MailboxOptions,
    countStar: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MailboxInputPartition]
    if (countStar) new CountStarReader(p)
    else new MailboxPartitionReader(p, readSchema, opts)
  }
}

/** A9 — the count(*) short-circuit reader: one row with the partition's
  * exact planned count; no file IO at execution time.
  */
class CountStarReader(p: MailboxInputPartition) extends PartitionReader[InternalRow] {
  private var emitted = false
  override def next(): Boolean = if (emitted) false else { emitted = true; true }
  override def get(): InternalRow = new GenericInternalRow(Array[Any](p.rowCount))
  override def close(): Unit = ()
}

/** Per-task reader (A15-A18): streams its byte ranges sequentially,
  * parses only projected fields, null-tolerant per field.
  */
class MailboxPartitionReader(
    p: MailboxInputPartition,
    readSchema: StructType,
    opts: MailboxOptions) extends PartitionReader[InternalRow] {

  private val mapper  = new ObjectMapper()
  private val factory = mapper.getFactory
  private val in      = new BufferedInputStream(new FileInputStream(p.file), 1 << 16)
  private var filePos = 0L
  private var idx     = -1
  private var current: InternalRow = _

  private val fileName = new Path(p.file).getName
  // truncation budget is a *byte* budget over UTF-16 text → chars = bytes/2
  // (reference row_serializer.cpp:83-114; 0 = read all, :302-304)
  private val bodyChars: Long =
    if (opts.bodySizeBytes <= 0) Long.MaxValue else opts.bodySizeBytes / 2

  // fast path: if every projected field is a top-level scalar, extract
  // values with the streaming parser and never build a JsonNode tree
  // (~2-3x less allocation on analytic projections)
  private val metaFields =
    Set("pst_path", "pst_name", "__partition", "__node_id")
  private val flatOnly: Boolean = readSchema.fields.forall { f =>
    metaFields.contains(f.name) || (f.dataType match {
      case _: ArrayType | _: StructType => false
      case _                            => true
    })
  }
  private val fieldIndex: Map[String, Int] =
    readSchema.fieldNames.zipWithIndex.toMap

  override def next(): Boolean = {
    idx += 1
    if (idx >= p.offsets.length) false
    else {
      val target = p.offsets(idx)
      if (target > filePos) { skipFully(target - filePos); filePos = target }
      val line = readLineBytes()
      current =
        try {
          if (flatOnly) rowOfStreaming(line)
          else rowOf(mapper.readTree(line))
        } catch { case NonFatal(_) => nullRow() }
      true
    }
  }

  /** Streaming extraction of projected top-level scalars. */
  private def rowOfStreaming(line: Array[Byte]): InternalRow = {
    import com.fasterxml.jackson.core.JsonToken
    val values = new Array[Any](readSchema.length)
    val parser = factory.createParser(line)
    try {
      if (parser.nextToken() == JsonToken.START_OBJECT) {
        var tok = parser.nextToken()
        while (tok != JsonToken.END_OBJECT && tok != null) {
          val name = parser.currentName()
          parser.nextToken() // move onto the value
          fieldIndex.get(name) match {
            case Some(i) if !metaFields.contains(name) =>
              values(i) =
                try {
                  if (parser.currentToken() == JsonToken.VALUE_NULL) null
                  else scalarValue(readSchema.fields(i), parser)
                } catch { case NonFatal(_) => null }
            case _ => parser.skipChildren() // no-op for scalars
          }
          tok = parser.nextToken()
        }
      }
    } finally parser.close()
    fillMeta(values)
    new GenericInternalRow(values)
  }

  private def scalarValue(
      f: StructField, parser: com.fasterxml.jackson.core.JsonParser): Any =
    f.dataType match {
      case StringType =>
        val s = parser.getValueAsString
        val t =
          if ((f.name == "body" || f.name == "body_html") && s.length > bodyChars)
            s.substring(0, bodyChars.toInt)
          else s
        UTF8String.fromString(t)
      case LongType      => parser.getValueAsLong
      case IntegerType   => parser.getValueAsInt
      case ShortType     => parser.getValueAsInt.toShort
      case DoubleType    => parser.getValueAsDouble
      case BooleanType   => parser.getValueAsBoolean
      case TimestampType => parser.getValueAsLong * 1000000L
      case BinaryType    => Base64.getDecoder.decode(parser.getValueAsString)
      case _             => null
    }

  private def fillMeta(values: Array[Any]): Unit = {
    fieldIndex.get("pst_path").foreach(i =>
      values(i) = UTF8String.fromString(p.file))
    fieldIndex.get("pst_name").foreach(i =>
      values(i) = UTF8String.fromString(fileName))
    fieldIndex.get("__partition").foreach(i => values(i) = p.index.toLong)
    fieldIndex.get("__node_id").foreach(i => values(i) = p.nodeIds(idx))
  }

  private def skipFully(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { if (in.read() == -1) return else left -= 1 }
      else left -= s
    }
  }

  private def readLineBytes(): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    var b   = in.read()
    var n   = 0L
    while (b != -1 && b != '\n') { out.write(b); n += 1; b = in.read() }
    filePos += n + (if (b == '\n') 1 else 0)
    out.toByteArray
  }

  private def nullRow(): InternalRow =
    new GenericInternalRow(readSchema.length)

  private def rowOf(node: JsonNode): InternalRow = {
    val values = new Array[Any](readSchema.length)
    var i = 0
    while (i < readSchema.length) {
      val f = readSchema.fields(i)
      // A16: any per-field failure degrades to NULL, never kills the row
      values(i) =
        try fieldValue(f, node)
        catch { case NonFatal(_) => null }
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def fieldValue(f: StructField, node: JsonNode): Any = f.name match {
    case "pst_path"    => UTF8String.fromString(p.file)
    case "pst_name"    => UTF8String.fromString(fileName)
    case "__partition" => p.index.toLong
    case "__node_id"   => p.nodeIds(idx)
    case name =>
      val v = node.get(name)
      if (v == null || v.isNull) null
      else convert(name, f.dataType, v)
  }

  private def convert(name: String, dt: DataType, v: JsonNode): Any = dt match {
    case StringType =>
      val s = v.asText()
      val truncated =
        if ((name == "body" || name == "body_html") && s.length > bodyChars)
          s.substring(0, bodyChars.toInt)
        else s
      UTF8String.fromString(truncated)
    case LongType      => v.asLong()
    case IntegerType   => v.asInt()
    case ShortType     => v.asInt().toShort
    case DoubleType    => v.asDouble()
    case BooleanType   => v.asBoolean()
    case BinaryType =>
      if (name == "bytes" && !opts.readAttachmentBody) null
      else Base64.getDecoder.decode(v.asText())
    case TimestampType => v.asLong() * 1000000L // TIMESTAMP_S → micros
    case ArrayType(et, _) =>
      val items = (0 until v.size()).map(j => convert(name, et, v.get(j)))
      new GenericArrayData(items.toArray)
    case st: StructType =>
      val vals = st.fields.map { sf =>
        val c = v.get(sf.name)
        if (c == null || c.isNull) null
        else
          try convert(sf.name, sf.dataType, c)
          catch { case NonFatal(_) => null }
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    case _ => null
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
