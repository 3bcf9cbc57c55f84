package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  * Plain parquet scans — Catalyst pushes filters/column pruning into them.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // events.ts has shipped under two encodings across testdata
      // generations: TIMESTAMP(NANOS) — which Spark's vectorized reader
      // rejects unless read as raw INT64 nanos via the legacy conf — and
      // TIMESTAMP_MICROS with isAdjustedToUTC=false, which Spark reads as
      // TIMESTAMP_NTZ. Branch on the dtype actually loaded so either
      // encoding yields the same TimestampType column (session is UTC, so
      // NTZ wall-clock values are preserved by the cast, matching what
      // DuckDB sees).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(path))
    } else spark.read.parquet(path)
  }

  /** Normalize the events `ts` column to TimestampType regardless of how
    * the fixture was encoded: INT64 raw nanos (legacy nanosAsLong read of
    * TIMESTAMP(NANOS)) → truncate to micros; TIMESTAMP_NTZ / anything else
    * → cast to timestamp.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
}
