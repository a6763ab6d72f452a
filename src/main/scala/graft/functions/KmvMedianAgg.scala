package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_kmv_median(expr)` — a DETERMINISTIC mergeable quantile
  * sketch as a native Catalyst aggregate: the buffer is the k = 64
  * distinct values whose md5(CAST(v AS STRING)) hex digests sort
  * lowest (a K-Minimum-Values sample — Bar-Yossef et al. 2002, the
  * same hash-ordered uniform sample q_kmv_distinct builds
  * relationally), and eval returns the LOWER MEDIAN of the kept
  * values. Hash-min selection is a SET operation — order-independent
  * and duplicate-insensitive — so unlike a reservoir sample (seeded,
  * arrival-order-dependent) or Misra-Gries (order-dependent counter
  * evictions, rejected in [[graft.ops.Sketches]]), the sketch is
  * bit-reproducible across partitionings, retries, AND engines: the
  * DuckDB oracle replays the identical selection with
  * `ORDER BY md5(CAST(v AS VARCHAR)) LIMIT 64`.
  *
  * Merge = union + keep-k-min (associative, commutative, idempotent
  * on overlap — a semilattice join, the same algebra the HLL/MinHash
  * siblings rely on), so partial aggregation is exact: each partition
  * ships ≤ 64 (hash, value) pairs however large its input.
  *
  * Accuracy: the kept values are the k distinct values with the
  * uniformly-smallest hashes, i.e. a uniform sample WITHOUT
  * replacement of the distinct-value population — the sampled median
  * estimates the median OF DISTINCT VALUES (near-unique inputs like
  * prices make this ≈ the row median; heavy duplication shifts it —
  * stated, not hidden).
  *
  * 100 TB shape: ≤ 64×(16 B hash + 8 B value) per (partition, group)
  * buffer under ObjectHashAggregate; a corpus-wide median costs one
  * bounded-summary shuffle — the register-extraction alternative
  * (q_quantile_sketch) shuffles O(distinct values) instead.
  */
case class KmvMedianAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[String, Long]]
    with UnaryLike[Expression] {

  private val K = 64

  override def prettyName: String = "graft_kmv_median"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty group → null median

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_median expects BIGINT, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeMap[String, Long] =
    new java.util.TreeMap[String, Long]()

  private val HEX = "0123456789abcdef".toCharArray

  private def md5hex(v: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes(StandardCharsets.UTF_8))
    // nibble lookup, not per-byte format parsing (the WinnowKernel
    // lesson: f"%02x" per byte dominated the whole kernel)
    val cs = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val x = d(i) & 0xff
      cs(2 * i) = HEX(x >> 4)
      cs(2 * i + 1) = HEX(x & 15)
      i += 1
    }
    new String(cs)
  }

  private def insert(buf: java.util.TreeMap[String, Long],
      h: String, v: Long): Unit = {
    // distinct-value semantics: same value → same hash → no-op re-put
    if (buf.size < K) buf.put(h, v)
    else if (h.compareTo(buf.lastKey()) < 0) {
      buf.put(h, v)
      if (buf.size > K) buf.remove(buf.lastKey())
    }
  }

  override def update(buf: java.util.TreeMap[String, Long],
      input: InternalRow): java.util.TreeMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      insert(buf, md5hex(l), l)
    }
    buf
  }

  override def merge(buf: java.util.TreeMap[String, Long],
      other: java.util.TreeMap[String, Long])
      : java.util.TreeMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[String, Long]): Any =
    if (buf.isEmpty) null
    else {
      val vals = new Array[Long](buf.size)
      val it = buf.values().iterator()
      var i = 0
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      vals((vals.length - 1) / 2) // lower median (repo convention)
    }

  override def serialize(buf: java.util.TreeMap[String, Long])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * (32 + 8))
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.put(e.getKey.getBytes(StandardCharsets.US_ASCII))
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeMap[String, Long]()
    var i = 0
    val hb = new Array[Byte](32)
    while (i < n) {
      bb.get(hb)
      out.put(new String(hb, StandardCharsets.US_ASCII), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMedianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMedianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KmvMedianAgg =
    copy(child = c)
}
