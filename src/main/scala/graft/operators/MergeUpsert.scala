package graft.operators

import org.apache.spark.sql.DataFrame

/** Keyed merge (CDC upsert): apply an updates batch to a snapshot —
  * update rows whose key matches, insert the rest, latest-wins.
  *
  * Formulated as updates ∪ (target ⟕anti updates): one shuffle per side
  * on the key, no full-outer join (whose null-coalescing projection is
  * both slower and wrong for deletes-as-tombstones extensions). At scale
  * this is the standard snapshot-maintenance shape: if both sides are
  * bucketed by the key the anti join is shuffle-free, and the result can
  * be written back bucketed for the next increment.
  */
object MergeUpsert {

  /** `updates` must carry the same schema as `target`. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val survivors = target.join(updates.select(keys.head, keys.tail: _*), keys, "left_anti")
    updates.unionByName(survivors)
  }
}
