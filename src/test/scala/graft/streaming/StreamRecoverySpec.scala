package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery: a stateful streaming aggregation stopped
  * mid-input and restarted from its checkpoint must produce exactly the
  * batch answer — state (including flatMapGroupsWithState-style
  * aggregation state) reloads from the state store, already-committed
  * micro-batches are not reprocessed, and remaining input drains. This
  * is the property that makes a 100 TB ingestion restartable after an
  * executor/driver loss without double counting.
  */
class StreamRecoverySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stateful aggregation restarted from checkpoint equals batch") {
    val splitDir = Files.createTempDirectory("graft_recovery_split").toString
    val ckpt = Files.createTempDirectory("graft_recovery_ckpt").toString
    val events = graft.Tables.load(spark, sf, "events")
      .select("user_id", "event_type", "value")
    events.repartition(6, col("user_id"))
      .write.mode("overwrite").parquet(splitDir)
    val batchTruth = events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    val schema = spark.read.parquet(splitDir).schema
    def aggStream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    def start(name: String) = aggStream().writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory")
      .queryName(name)
      .start()

    // phase 1: let a FEW micro-batches commit, then stop mid-input
    // (simulated crash) — processAllAvailable would drain everything
    val q1 = start("recovery_phase1")
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    val committed = q1.recentProgress.count(_.numInputRows > 0)
    assert(committed >= 1, "phase 1 committed no micro-batches")
    assert(committed < 6, "phase 1 consumed all input; nothing to recover")

    // phase 2: restart from the same checkpoint; state must reload and
    // only the remaining input replays
    val q2 = start("recovery_phase2")
    q2.processAllAvailable()
    q2.stop()
    val recovered = spark.table("recovery_phase2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(recovered == batchTruth,
      s"recovered state diverged from batch:\n$recovered\nvs\n$batchTruth")
  }
}
