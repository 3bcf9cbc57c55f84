package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q06_join_skew_aqe's reason to exist is the PLAN, not the numbers: AQE
  * must detect the 90%-hot shuffle partition at runtime and split it
  * (OptimizeSkewedJoin → SortMergeJoin(skew=true)). This spec executes
  * the join and asserts the optimization actually fired in the final
  * adaptive plan — and, as the negative control, that the same join under
  * default production thresholds (256 MB) does NOT fire at this SF, which
  * is exactly why the query scopes its demonstration thresholds to an
  * isolated child session instead of the shared one.
  */
class SkewJoinSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession =
    graft.GraftSession.builder("local[8]", 8).getOrCreate()

  test("OptimizeSkewedJoin fires on the deliberately skewed merge join") {
    val df = graft.queries.Extended.skewAqeJoin(spark, sf)
    val rows = df.collect()
    assert(rows.length == 2, "hot + cold key classes")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"executed plan must contain a skew-split SortMergeJoin; got:\n$plan")
  }

  test("negative control: default thresholds do not fire at this SF") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.load(spark, sf, "events")
      .withColumn("skew_key",
        when(col("event_id") % 10 < 9, lit("hot"))
          .otherwise(concat(lit("cold_"), (col("event_id") % 97).cast("string"))))
    val dim = events.select(col("skew_key").as("d_key")).distinct()
    val df = events.join(dim.hint("merge"), col("skew_key") === col("d_key"))
      .groupBy("skew_key").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("skew=true"),
      "256 MB default thresholds must not flag a test-SF partition as skewed")
  }
}
