package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: with a hot key dominating one side, adaptive
  * execution must split the oversized partition into parallel subtasks
  * (skew=true in the executed SMJ) instead of letting one task carry the
  * whole key — the runtime complement to the manual salting operator
  * (q06_join_salted), and the default defense a 100 TB join relies on
  * when skew isn't known in advance. Thresholds are scaled down so the
  * test's ~200k-row hot key trips the same machinery a multi-GB hot
  * partition trips in production.
  */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a hot key is split by AQE skew-join in the executed plan") {
    // 95% of the fact rows share key 0; dim is uniform. The payload is
    // an md5 string that survives column pruning (it feeds the agg) and
    // defeats shuffle compression, so the hot partition's on-disk size
    // actually exceeds the scaled-down skew threshold.
    val fact = spark.range(300000)
      .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100)
        .as("k"), md5(col("id").cast("string")).as("payload"))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("attr_"), col("id")).as("attr"))
    val joined = fact.join(dim, "k").groupBy("attr")
      .agg(count(lit(1)).as("n"), max("payload").as("mx"))
    // run THIS dataset so its adaptive plan is final before inspection
    val n = joined.collect().map(_.getLong(1)).sum
    assert(n == 300000L, s"join dropped rows: $n")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the hot partition as skewed:\n$plan")
  }
}
