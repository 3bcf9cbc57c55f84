package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift protection for the events fixture loader.
  *
  * The driver has shipped `events.ts` under two parquet encodings across
  * testdata generations: TIMESTAMP(NANOS) (which the legacy nanosAsLong
  * conf surfaces as raw INT64 nanos) and TIMESTAMP_MICROS with
  * isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Round 5 proved that
  * a loader hard-wired to one encoding silently zeroes every
  * events-derived query when the other shows up. This spec writes the
  * fixture BOTH ways and asserts `Tables.load` yields TimestampType and
  * identical rows for each — so a future regeneration flips a test red
  * instead of erasing a fifth of the inventory.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Rows as (event_id, micros-since-epoch) with the rest of the events
    * schema along for the ride.
    */
  private val fixtureMicros: Seq[(Long, Long)] = Seq(
    (1L, 1700000000000000L),           // 2023-11-14 22:13:20 UTC
    (2L, 1700000000123456L),           // sub-second precision survives
    (3L, 1577836800000000L),           // 2020-01-01 00:00:00 UTC
    (4L, 1735689599999999L))           // end-of-2024 boundary

  private def writeFixture(dir: String, encoding: String): Unit = {
    import spark.implicits._
    val base = fixtureMicros.toDF("event_id", "us")
    val df = encoding match {
      case "ntz_micros" =>
        // current testdata generation: TIMESTAMP_MICROS, isAdjustedToUTC=0
        base.select(
          col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
          (col("event_id") % 7).as("user_id"),
          lit("click").as("event_type"),
          col("us").cast("double").as("value"),
          lit("""{"k":1}""").as("props"))
      case "int64_nanos" =>
        // legacy generation: TIMESTAMP(NANOS). Spark cannot write that
        // annotation, so model what the loader actually sees — the
        // nanosAsLong conf turns it into a plain INT64 nanos column,
        // which is byte-identical to writing raw INT64 nanos.
        base.select(
          col("event_id"),
          (col("us") * 1000L).as("ts"),
          (col("event_id") % 7).as("user_id"),
          lit("click").as("event_type"),
          col("us").cast("double").as("value"),
          lit("""{"k":1}""").as("props"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadRows(dir: String): (DataType, Seq[Row]) = {
    val df = Tables.load(spark, dir, "events")
    (df.schema("ts").dataType,
      df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id").collect().toSeq)
  }

  test("events loader yields TimestampType + identical rows for both fixture encodings") {
    val dirNtz = Files.createTempDirectory("graft_tables_ntz").toString
    val dirNanos = Files.createTempDirectory("graft_tables_nanos").toString
    writeFixture(dirNtz, "ntz_micros")
    writeFixture(dirNanos, "int64_nanos")

    val (dtNtz, rowsNtz) = loadRows(dirNtz)
    val (dtNanos, rowsNanos) = loadRows(dirNanos)

    assert(dtNtz === TimestampType, "NTZ-micros fixture must normalize to TimestampType")
    assert(dtNanos === TimestampType, "INT64-nanos fixture must normalize to TimestampType")
    assert(rowsNtz === rowsNanos, "both encodings must load to identical rows")

    // and the wall-clock values are the ones written (UTC session)
    val got = rowsNtz.map(r => r.getTimestamp(1).toInstant)
    val want = fixtureMicros.map { case (_, us) =>
      java.time.Instant.EPOCH.plusNanos(us * 1000L) }
    assert(got === want)
  }

  test("an unannotated INT64 ts that is not plausibly nanos fails loudly") {
    // the hypothetical THIRD encoding ADVICE r6 warned about: raw INT64
    // micros. Under the nanos reading these land in 1970 — the loader
    // must refuse instead of silently loading every timestamp 1000x off.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tables_micros").toString
    fixtureMicros.toDF("event_id", "us")
      .select(
        col("event_id"), col("us").as("ts"),
        (col("event_id") % 7).as("user_id"),
        lit("click").as("event_type"),
        col("us").cast("double").as("value"),
        lit("""{"k":1}""").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("not plausible"))
  }

  test("the real testdata events table loads with TimestampType") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
