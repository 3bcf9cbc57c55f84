package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-loop generation compaction (q87): per-trigger index generations
  * fold into one compacted epoch whenever the serving-directory count
  * reaches k — the generation bound a long-lived stream needs. The
  * query's row carries the contracts; this spec restates them with
  * names, drives a NON-default (k, slices) shape, and checks the
  * physical claim directly on disk (the row's booleans could in
  * principle be computed from stale bookkeeping; the directory listing
  * cannot).
  */
class StreamIndexCompactSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dirCount(idx: String, sub: String, prefix: String): Int =
    Option(new java.io.File(s"$idx/$sub").listFiles()).toSeq.flatten
      .count(_.getName.startsWith(prefix))

  test("default shape: 8 triggers fold 4 times, the serving-directory " +
      "count never exceeds k=3, and folding is invisible to queries") {
    val row = StreamOps.streamIndexCompact(spark, sf).collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getLong(0) == 8, "8 triggers")
    assert(row.getLong(1) == 4,
      "with k=3 the fold fires on every other trigger: 4 folds")
    assert(row.getBoolean(2),
      "the serving-directory count must stay ≤ k at EVERY trigger")
    assert(row.getLong(3) == n, "serving covers every embedding once")
    assert(row.getBoolean(4), "no id served twice")
    assert(row.getBoolean(5),
      "final serving must be row-identical to a one-shot encode of " +
        "base + all arrivals — the fold is invisible to queries")
    assert(row.getLong(6) == 10)
    // physical claim, straight from the filesystem: ≤ k directories
    // remain (here: 1 compacted epoch + the unfolded tail)
    val idx = graft.RunPaths.scratch(
      s"graft_q87_index_${graft.RunPaths.keyFor(sf)}_3_8")
    val remaining = dirCount(idx, "codes", "gen=") +
      dirCount(idx, "compact", "epoch=")
    assert(remaining <= 3,
      s"on-disk serving directories must be bounded by k: $remaining")
    assert(dirCount(idx, "compact", "epoch=") == 1,
      "superseded epochs must be swept — exactly the latest remains")
  }

  test("k=2 folds at every trigger: the stream runs at a constant ONE " +
      "serving directory no matter how many triggers arrive") {
    val row = StreamOps.streamIndexCompact(spark, sf, k = 2, slices = 5)
      .collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getLong(0) == 5)
    assert(row.getLong(1) == 5,
      "k=2 means every trigger reaches the bound and folds")
    assert(row.getBoolean(2))
    assert(row.getLong(3) == n)
    assert(row.getBoolean(4))
    assert(row.getBoolean(5), "per-trigger folding still invisible")
    assert(row.getLong(6) == 10)
    val idx = graft.RunPaths.scratch(
      s"graft_q87_index_${graft.RunPaths.keyFor(sf)}_2_5")
    assert(dirCount(idx, "codes", "gen=") == 0 &&
      dirCount(idx, "compact", "epoch=") == 1,
      "after a trailing fold exactly one compacted epoch serves")
  }
}
