package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The closed drift loop on the stream (q84): detect → retrain → serve
  * with no operator in the loop. The query's own contract covers the
  * happy path (clean quiet, drift fires, post-retrain quiet, exact
  * coverage); this spec adds the negative control the row cannot
  * carry — after a mid-stream retrain the trigger must stay ARMED, so
  * a post batch drifted a second time fires a SECOND retrain. A loop
  * that can only fire once is a one-shot, not a loop.
  */
class StreamIndexRetrainSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("happy path: clean appends quiet, drift retrains inline, the " +
      "in-distribution post batch appends quietly on the NEW index") {
    val row = StreamOps.streamIndexRetrain(spark, sf).collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getLong(0) == 4, "4 triggers (2 clean + drift + post)")
    assert(row.getBoolean(1), "clean batches must not fire")
    assert(row.getBoolean(2), "the drifted batch fires exactly once")
    assert(row.getBoolean(3),
      "the merged-distribution post batch must append quietly on the " +
        "retrained index — the loop iterates in-stream")
    assert(row.getLong(4) == 2 * n, "serving covers every row exactly once")
    assert(row.getBoolean(5), "no id served twice")
    assert(row.getLong(6) == 10)
  }

  test("the trigger stays ARMED after a retrain: a second-drifted post " +
      "batch fires a second retrain, coverage still exact") {
    val row = StreamOps.streamIndexRetrain(spark, sf, postShifted = true)
      .collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getLong(0) == 4)
    assert(row.getBoolean(1), "clean batches still quiet")
    assert(!row.getBoolean(2),
      "two retrains fired — drift_fires_once is the once-only flag")
    assert(!row.getBoolean(3),
      "a re-drifted post batch must FIRE, not append quietly")
    assert(row.getLong(4) == 2 * n,
      "the second retrain still covers every row exactly once")
    assert(row.getBoolean(5))
    assert(row.getLong(6) == 10)
  }
}
