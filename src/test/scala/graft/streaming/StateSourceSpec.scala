package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** The state data source (`spark.read.format("statestore")`) — the ops
  * surface for a 100 TB stateful pipeline: inspect the live keyed state
  * of a checkpoint WITHOUT stopping the query or instrumenting the
  * processor. This spec drives the tws per-user stats pipeline to
  * completion against a real checkpoint, then reads both state
  * variables back offline and proves they equal the batch ground truth:
  * the ValueState tuple (n, cents, ver) per user and the MapState
  * distinct-type keys per user.
  */
class StateSourceSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("statestore source reads tws ValueState and MapState back to batch truth") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_state_src").toString
    val ckpt = Files.createTempDirectory("graft_state_ckpt").toString
    val outDir = Files.createTempDirectory("graft_state_out").toString

    val events = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        col("event_type"))
    events.write.mode("overwrite").parquet(srcDir)

    val q = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
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
      .start()
    q.processAllAvailable()
    q.stop()

    // ValueState "agg": (n_events, total_cents, ver) per user
    val aggState = spark.read.format("statestore")
      .option("stateVarName", "agg")
      .load(ckpt)
    val gotAgg = aggState
      .select(col("key.*"), col("value.*"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val wantAgg = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(gotAgg == wantAgg,
      s"ValueState mismatch:\n${gotAgg.toSeq.sortBy(_._1).take(5)}\nvs\n${wantAgg.toSeq.sortBy(_._1).take(5)}")

    // MapState "types": one entry per (user, distinct event_type)
    val typesState = spark.read.format("statestore")
      .option("stateVarName", "types")
      .load(ckpt)
    val gotTypes = typesState
      .select(col("key.*"), col("user_map_key.*"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    val wantTypes = events.select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotTypes == wantTypes)
  }
}
