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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as raw nanos (legacy conf) and truncate to
      // microseconds — the same conversion DuckDB applies when it casts
      // timestamp_ns to its microsecond TIMESTAMP.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }
}
