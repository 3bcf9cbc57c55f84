package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery for `transformWithState` on the RocksDB store:
  * StreamTwsSpec proves slicing-invariance, StreamRecoverySpec proves
  * kill/restart for the built-in aggregation state — this spec closes
  * the remaining gap: a tws query stopped MID-STREAM and restarted from
  * its checkpoint must equal the uninterrupted batch answer. That
  * exercises the full recovery path: ValueState/MapState reload from the
  * RocksDB changelog, `ver` continuity across the restart (state, not
  * sink, carries it), no double-application of already-committed
  * micro-batches, and the file sink's exactly-once manifest across two
  * query incarnations.
  */
class TwsRecoverySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("tws restarted from checkpoint equals the uninterrupted run") {
    import spark.implicits._
    val splitDir = Files.createTempDirectory("graft_tws_rec_split").toString
    val ckpt = Files.createTempDirectory("graft_tws_rec_ckpt").toString
    val outDir = Files.createTempDirectory("graft_tws_rec_out").toString

    val events = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        col("event_type"))
    events.repartition(6, col("user_id"))
      .write.mode("overwrite").parquet(splitDir)
    val batchTruth = events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"),
        countDistinct("event_type").as("n_types"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val schema = spark.read.parquet(splitDir).schema
    def start(name: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet")
      .option("path", outDir)
      .queryName(name)
      .start()

    // phase 1: let a FEW micro-batches commit, then stop mid-input
    val q1 = start("tws_rec_phase1")
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    val committed = q1.recentProgress.count(_.numInputRows > 0)
    assert(committed >= 1, "phase 1 committed no micro-batches")
    assert(committed < 6, "phase 1 consumed all input; nothing to recover")

    // phase 2: restart from the same checkpoint — ValueState/MapState
    // must reload (ver continues, counts include phase-1 events) and
    // only the remaining files replay
    val q2 = start("tws_rec_phase2")
    q2.processAllAvailable()
    q2.stop()

    // the file sink accumulated versioned emissions across BOTH
    // incarnations (manifest-gated, so an uncommitted phase-1 batch
    // cannot contribute); per-user max-ver row = final state
    val recovered = spark.read.parquet(outDir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ver"), col("n_events"), col("total_cents"),
        col("n_types"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_cents"),
        col("s.n_types"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(recovered == batchTruth,
      s"tws state diverged across restart:\n${recovered.toSeq.sortBy(_._1).take(5)}...\nvs\n${batchTruth.toSeq.sortBy(_._1).take(5)}...")
  }
}
