package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics the batch-equivalence oracles cannot exercise:
  * with controlled micro-batches, an event older than (max seen ts -
  * watermark) must be DROPPED from a windowed aggregation in append mode,
  * and windows only emit once the watermark passes their end.
  */
class WatermarkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("late events beyond the watermark are dropped in append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("k"), col("n"))
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("wm_drop")
      .start()
    try {
      // batch 1: two rows in hour-10, one in hour-12 (advances watermark
      // to 11:50 — past hour-10's end, so hour-10 finalizes)
      in.addData(
        (ts("2024-01-01 10:00:05"), "a"),
        (ts("2024-01-01 10:30:00"), "a"),
        (ts("2024-01-01 12:00:00"), "b"))
      q.processAllAvailable()
      // batch 2: a LATE hour-10 row (watermark is 11:50) must be dropped;
      // an hour-12 row is still on time
      in.addData(
        (ts("2024-01-01 10:45:00"), "a"),
        (ts("2024-01-01 12:10:00"), "b"))
      q.processAllAvailable()
      // batch 3: advance watermark past hour-12 so it finalizes
      in.addData((ts("2024-01-01 14:00:00"), "c"))
      q.processAllAvailable()
      val rows = spark.table("wm_drop")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2))
      // hour-10 'a' count is 2 — the late row did NOT arrive; hour-12 'b'
      // counts both on-time rows
      assert(rows.contains(("2024-01-01 10:00:00.0", "a", 2L)), rows.mkString(","))
      assert(rows.contains(("2024-01-01 12:00:00.0", "b", 2L)), rows.mkString(","))
      assert(!rows.exists(r => r._2 == "a" && r._3 == 3L), rows.mkString(","))
    } finally q.stop()
  }

  test("windows do not emit before the watermark passes their end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("append").format("memory").queryName("wm_hold").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:59:00"), "a"))
      q.processAllAvailable()
      // watermark = 10:49 < 11:00 — nothing may emit yet
      assert(spark.table("wm_hold").count() == 0)
      in.addData((ts("2024-01-01 11:30:00"), "a"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 13:00:00"), "a"))
      q.processAllAvailable()
      assert(spark.table("wm_hold").count() >= 1)
    } finally q.stop()
  }
}
