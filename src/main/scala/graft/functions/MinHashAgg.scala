package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash(expr)` — the 8-slot MinHash signature as a NATIVE
  * Catalyst aggregate function: buffer = 8 slot minima over
  * [[MinhashKernel.slices8]]'s salted-MD5 digest slices (the same hash
  * family as the per-doc signatures and q_source_minhash's
  * hand-assembled min aggregation), merge = element-wise min.
  *
  * Unlike an order-sensitive sketch (e.g. Misra-Gries, whose counter
  * set depends on arrival order and so cannot be deterministic under
  * Spark's nondeterministic partition order), slot-min is fully
  * order-independent — the aggregate is safe to hash-compare across
  * engines and runs. Returns the signature as ARRAY<BIGINT>(8);
  * callers flatten to columns before the driver compare (array cells
  * crash the checker's sort — the round-5 q_inverted_index lesson).
  *
  * 100 TB shape: 64-byte buffer per (partition, group), algebraic
  * merge under ObjectHashAggregate partial aggregation — a source's
  * similarity summary shuffles as one 8-long row per partition.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects STRING, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(8)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = MinhashKernel.slices8(v.asInstanceOf[UTF8String])
      var j = 0
      while (j < 8) {
        val x = s.getLong(j)
        if (x < buf(j)) buf(j) = x
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 8) { if (other(j) < buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MinHashAgg =
    copy(child = c)
}
