package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (beyond the reference, which exposes none —
  * SURVEY.md §2 notes): an exact bounded top-k aggregator.
  *
  * Buffer is a sorted vector capped at k, so partial aggregation keeps
  * at most k elements per task before the shuffle — the distributed
  * top-k shape (same contract as TakeOrderedAndProject, but usable as
  * an aggregate inside any groupBy).
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.length < k) (buf :+ v).sortBy(-_)
    else if (v > buf.last) (buf.init :+ v).sortBy(-_)
    else buf
  }

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] = insert(buf, v)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sortBy(-_).take(k)

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
