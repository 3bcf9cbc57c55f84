package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k Aggregator (SURVEY §2.2 Q21): keeps the k largest doubles
  * per group in a bounded buffer — a distributed partial-aggregate top-k
  * whose shuffle carries at most k values per group per partition,
  * instead of the full group contents a sort-based approach would move.
  * Output is sorted descending.
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Seq.empty

  private def trim(s: Seq[Double]): Seq[Double] =
    s.sorted(Ordering[Double].reverse).take(k)

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.size < k) trim(buf :+ v)
    else if (v > buf.last) trim(buf :+ v)
    else buf

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = trim(a ++ b)

  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
