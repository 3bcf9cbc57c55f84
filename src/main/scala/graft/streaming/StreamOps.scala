package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the bounded `events` table: the stream is
  * driven to completion with processAllAvailable() against a memory sink,
  * so results are batch-equivalent and can face the same DuckDB oracle as
  * any other query (SURVEY §2.2 Q20).
  *
  * Scale notes: these are the standard production shapes — tumbling /
  * sliding window aggregation with a watermark bounding state, and
  * streaming dropDuplicates whose state is likewise watermark-expired.
  * On an unbounded source the same code runs with a real trigger; the
  * memory sink + complete/update mode here is only the test harness.
  */
object StreamOps {

  /** Streaming view of events.parquet (nanos → micros like Tables.load).
    * The file-stream source requires a DIRECTORY; testdata ships a single
    * parquet file, so stage a symlink to it in a per-sf temp directory.
    */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val streamDir = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_events_stream_${math.abs(sfDir.hashCode)}")
    if (!Files.exists(streamDir)) {
      Files.createDirectories(streamDir)
      Files.createSymbolicLink(
        streamDir.resolve("events.parquet"), Paths.get(s"$sfDir/events.parquet"))
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .parquet(streamDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run a streaming aggregation to completion against a memory sink and
    * return the final table.
    */
  private def runToMemory(
      spark: SparkSession, df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  /** Tumbling 1-hour windows with a 10-minute watermark. */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    runToMemory(spark, agg, s"tumbling_${System.nanoTime()}", "complete")
      .select(col("window.start").as("w_start"), col("event_type"), col("n_events"))
      .orderBy("w_start", "event_type")
  }

  /** Sliding 2-hour windows every 1 hour (each event lands in 2 windows). */
  def sliding(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"))
    runToMemory(spark, agg, s"sliding_${System.nanoTime()}", "complete")
      .select(col("window.start").as("w_start"), col("n_events"))
      .orderBy("w_start")
  }

  /** Streaming dropDuplicates state: first event per (user_id, event_type)
    * key; result counted per event_type — batch-equivalent to
    * COUNT(DISTINCT user_id) per type.
    */
  def dedupState(spark: SparkSession, sfDir: String): DataFrame = {
    val dedup = eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    runToMemory(spark, dedup, s"dedup_${System.nanoTime()}", "complete")
      .orderBy("event_type")
  }
}
