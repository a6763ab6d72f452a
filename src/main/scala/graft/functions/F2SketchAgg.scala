package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_f2(key, weight)` — the Alon–Matias–Szegedy "tug-of-war"
  * sketch of the second frequency moment F2 = Σ_t f_t² as a native
  * Catalyst aggregate (AMS, STOC'96). F2 is the self-join size of the
  * key column — the quantity a 100 TB pipeline needs to price a
  * shuffle join or measure corpus skew BEFORE running it.
  *
  * The buffer is 32 signed BIGINT counters; counter j accumulates
  * `sign_j(key) · weight` where `sign_j` is ±1 from the parity of the
  * first hex nibble of `md5(j || ':' || key)` — the repo's md5-prefix
  * hash convention, so the DuckDB oracle replays the identical
  * counters with `(strpos('0123456789abcdef', substr(md5(…),1,1))-1) % 2`.
  * E[counter²] = F2 exactly (pairwise sign independence); eval
  * averages squares within 4 groups of 8 counters (each sum kept as
  * an exact BIGINT of 8·counter², no division) and returns the LOWER
  * MEDIAN of the 4 group sums divided by 8 — a median-of-means
  * estimator, deterministic and integer-exact end to end.
  *
  * Unlike the HLL/MinHash/KMV siblings (semilattice merges), this is
  * a LINEAR sketch: merge = elementwise vector ADD, so partial
  * aggregation, retries, and any partitioning commute with the
  * estimate not just up to the kept set but EXACTLY — the property
  * the F2SketchSpec pins (sketch(A ∪ B) == sketch(A) + sketch(B)).
  * Weighted updates let callers feed pre-aggregated (key, count)
  * pairs: sketching the distinct-key frame costs O(vocabulary) hash
  * work instead of O(corpus).
  *
  * Exactness bound (stated, not hidden): counters concentrate around
  * ±√F2, and eval squares them — the estimate is exact BIGINT while
  * F2 < 2⁶³/8 (≈10¹⁸, i.e. key frequencies summing squares under a
  * quintillion); beyond that both engines would need 128-bit
  * accumulation (DuckDB HUGEINT / Spark DECIMAL(38,0)).
  *
  * 100 TB shape: a fixed 256-byte buffer per (partition, group) under
  * ObjectHashAggregate; a corpus-wide self-join-size estimate costs
  * one bounded-summary shuffle of 32 longs per partition, never the
  * keys.
  */
case class F2SketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with BinaryLike[Expression] {

  private val R = 32 // counters
  private val G = 4  // eval groups of R/G counters

  override def prettyName: String = "graft_f2"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false // empty group → 0 (F2 of ∅)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_f2 expects (STRING, BIGINT), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](R)

  // Per-operator-instance hashing state, built once instead of per
  // row: q_stream_f2 feeds RAW events (weight = 1), i.e. O(corpus)
  // signs() calls, so a fresh MessageDigest + 32 freshly-encoded
  // "j:" prefix strings per row is measurable allocation churn.
  // @transient lazy: rebuilt after task-side deserialization, never
  // serialized. A single digest per instance is safe — aggregate
  // instances are per-task, and update/merge are single-threaded
  // within a task.
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(R)(j => s"$j:".getBytes(StandardCharsets.UTF_8))

  /** sign_j(key) = +1 if the first hex nibble of md5(j:key) is even,
    * else −1 (the oracle's `% 2` on the nibble value).
    */
  private def signs(key: UTF8String): Array[Int] = {
    val out = new Array[Int](R)
    val keyBytes = key.getBytes // UTF8String is already UTF-8 bytes
    var j = 0
    while (j < R) {
      md.reset()
      md.update(prefixes(j))
      md.update(keyBytes)
      val nibble = (md.digest()(0) >> 4) & 0xf
      out(j) = if ((nibble & 1) == 0) 1 else -1
      j += 1
    }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = left.eval(input)
    val w = right.eval(input)
    if (k != null && w != null) {
      val s = signs(k.asInstanceOf[UTF8String])
      val weight = w.asInstanceOf[Long]
      var j = 0
      while (j < R) { buf(j) += s(j) * weight; j += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < R) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val per = R / G
    val sums = new Array[Long](G)
    var g = 0
    while (g < G) {
      var acc = 0L
      var j = 0
      while (j < per) {
        val c = buf(g * per + j)
        acc += c * c
        j += 1
      }
      sums(g) = acc
      g += 1
    }
    java.util.Arrays.sort(sums)
    sums((G - 1) / 2) / per // lower median of group means (repo convention)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(R * 8)
    var j = 0
    while (j < R) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](R)
    var j = 0
    while (j < R) { out(j) = bb.getLong(); j += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): F2SketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): F2SketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): F2SketchAgg = copy(left = l, right = r)
}
