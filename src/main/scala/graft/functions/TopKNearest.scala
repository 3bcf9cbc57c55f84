package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (distance, id) candidate for [[TopKNearest]]. */
case class DistId(dist: Double, id: Long)

/** Bounded-buffer NEAREST-k Aggregator for batch ANN serving
  * (ProductQuantizer.ivfPqTopKBatch / q100_batch_serve): keeps the k
  * smallest (dist, id) pairs per group under the serving total order
  * (dist asc, id asc — the same order every single-query path ranks
  * by, so batch and single-query answers are comparable id-for-id).
  *
  * The scale property this buys over a per-query window: partial
  * aggregation. The map side reduces each partition's candidates to
  * ≤ k rows per query BEFORE the shuffle, so the exchange carries
  * O(queries × k × partitions) instead of every ADC-scored row — the
  * aggregator is to the batch path what TakeOrderedAndProject is to
  * the single-query path. Output is sorted (dist asc, id asc).
  */
class TopKNearest(k: Int)
    extends Aggregator[DistId, Seq[DistId], Seq[DistId]] {

  private val ord: Ordering[DistId] =
    Ordering.by[DistId, (Double, Long)](d => (d.dist, d.id))

  override def zero: Seq[DistId] = Seq.empty

  private def trim(s: Seq[DistId]): Seq[DistId] = s.sorted(ord).take(k)

  override def reduce(buf: Seq[DistId], v: DistId): Seq[DistId] =
    if (buf.size < k) trim(buf :+ v)
    else if (ord.lt(v, buf.last)) trim(buf :+ v)
    else buf

  override def merge(a: Seq[DistId], b: Seq[DistId]): Seq[DistId] =
    trim(a ++ b)

  override def finish(r: Seq[DistId]): Seq[DistId] = r

  override def bufferEncoder: Encoder[Seq[DistId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DistId]]()
  override def outputEncoder: Encoder[Seq[DistId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DistId]]()
}
