package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property the oracle can't see: incremental SCD2 maintenance must
  * equal the batch derivation even when events arrive across MANY
  * micro-batches in an order scrambled relative to event time — a late
  * event landing mid-history must trigger a correct rebuild of its
  * user, not an append-only interval patch.
  */
class StreamScd2Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scrambled multi-micro-batch arrival equals the batch rollup") {
    val batchTruth = {
      import org.apache.spark.sql.expressions.Window
      val sentinel = lit("2200-01-01 00:00:00").cast("timestamp")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.Tables.load(spark, sf, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("valid_to", coalesce(lead(col("ts"), 1).over(w), sentinel))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(when(col("valid_to") === sentinel, 1L).otherwise(0L))
            .as("n_current"),
          max(col("ts")).as("last_change_ts"))
        .orderBy("event_type")
        .collect().map(_.toSeq).toSeq
    }
    assert(batchTruth.nonEmpty)

    // split events into 5 files keyed by a hash UNRELATED to event time:
    // each user's history is spread over several micro-batches and
    // arrives out of ts order (file N can hold both early and late rows)
    val splitDir = Files.createTempDirectory("graft_scd2_split").toString
    graft.Tables.load(spark, sf, "events")
      .repartition(5, xxhash64(col("event_id")))
      .write.mode("overwrite").parquet(splitDir)
    val schema = spark.read.parquet(splitDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val streamed = StreamOps.streamScd2From(spark, sf, stream)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batchTruth)
  }
}
