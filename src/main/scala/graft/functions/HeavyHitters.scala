package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed, mergeable Aggregator:
  * at most `k` counters per partial summary, one pass, O(k) memory.
  *
  * Guarantee (the reason this works at 100 TB): any item with true
  * frequency > n/(k+1) is ALWAYS present in the final summary, for any
  * partitioning and any merge order — the decrement step removes at most
  * n/(k+1) occurrences of each item across the whole run. Reported counts
  * are underestimates (true count − reported ≤ n/(k+1)); the candidate
  * SET beyond the guaranteed items depends on merge order, so downstream
  * use is: sketch → candidate set → one cheap exact count over just the
  * candidates. The shuffle carries k counters per partition instead of
  * one row per distinct item.
  */
class HeavyHitters(k: Int) extends Aggregator[Long, mutable.Map[Long, Long], Map[Long, Long]] {
  require(k > 0, "heavy-hitters sketch needs k > 0 counters")

  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  private def offer(b: mutable.Map[Long, Long], item: Long, by: Long): Unit = {
    b.get(item) match {
      case Some(c) => b(item) = c + by
      case None if b.size < k => b(item) = by
      case None =>
        // decrement all counters by the smaller of `by` and the current
        // minimum; counters that hit zero free their slot
        val dec = math.min(by, b.valuesIterator.min)
        val dead = mutable.ArrayBuffer.empty[Long]
        b.keysIterator.foreach { key =>
          val c = b(key) - dec
          if (c <= 0) dead += key else b(key) = c
        }
        dead.foreach(b.remove)
        if (by > dec) offer(b, item, by - dec)
    }
  }

  override def reduce(b: mutable.Map[Long, Long], item: Long): mutable.Map[Long, Long] = {
    offer(b, item, 1L)
    b
  }

  override def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b.foreach { case (item, c) => offer(a, item, c) }
    a
  }

  override def finish(b: mutable.Map[Long, Long]): Map[Long, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    Encoders.kryo[mutable.Map[Long, Long]]

  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}
