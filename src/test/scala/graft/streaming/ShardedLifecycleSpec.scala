package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q97_sharded_lifecycle — the fold machine over the sharded layout.
  * The registered query runs at maxFilesPerTrigger=1 (5 triggers);
  * this spec re-runs the SAME harness at the coarser slicing (the
  * clean phase's 2 files land in one micro-batch → 4 triggers) and
  * asserts every contract EXCEPT the trigger count unchanged — in
  * particular `same_as_oneshot`, which is slicing-independent by
  * construction, so equality to it on both slicings pins slicing
  * invariance of the final sharded serving state transitively. The
  * cross-shard ordering contracts (mixed window serves old, per-shard
  * isolation, all-adopted barrier) must also hold at any slicing —
  * they are properties of the durable protocol, not of the harness's
  * batch boundaries.
  */
class ShardedLifecycleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val contracts = Seq("drift_fires_once", "clean_quiet",
    "ptr_reads_bounded_per_shard", "shard0_adopted_first",
    "shard1_isolated_during_belt", "mixed_window_serves_old",
    "midwindow_batch_unchanged", "midwindow_batch_partial_agg",
    "all_shards_adopted", "adopted_once_each", "scatter_gather_plan",
    "ids_unique", "same_as_oneshot")

  test("coarser slicing: 4 triggers, every protocol contract green") {
    val row = StreamOps.shardedLifecycle(spark, sf, filesPerTrigger = 2)
      .collect()(0)
    assert(row.getAs[Long]("n_triggers") == 4L)
    for (c <- contracts)
      assert(row.getAs[Boolean](c), s"$c must hold at the coarse slicing")
    assert(row.getAs[Long]("n_results") == 10L)
  }

  test("S=4 shards with batch queries served during the mixed window: " +
      "every protocol contract green (r16 verdict #7)") {
    val row = StreamOps.shardedLifecycle(spark, sf, filesPerTrigger = 2,
        nShards = 4)
      .collect()(0)
    // 3 lagging shards hold while shard 0 adopts; the mid-window batch
    // must still read one consistent pointer across all four subtrees
    for (c <- contracts)
      assert(row.getAs[Boolean](c), s"$c must hold at S=4")
    assert(row.getAs[Long]("n_results") == 10L)
  }
}
