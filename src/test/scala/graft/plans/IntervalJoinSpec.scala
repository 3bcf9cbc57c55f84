package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the custom broadcast point-in-interval join: exact inner
  * `lo <= p < hi` semantics (checked against the nested-loop equivalent
  * on adversarial interval sets), the custom exec in the physical plan
  * backed by a standard broadcast exchange, and no nested-loop join.
  */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches the nested-loop equivalent on overlapping/keyed intervals") {
    IntervalJoin.install(spark)
    // nested, duplicated, zero-width, and disjoint intervals per key;
    // one key absent from the build side
    val probe = Seq(
      ("a", 0L), ("a", 5L), ("a", 10L), ("a", 15L), ("a", 99L),
      ("b", 5L), ("b", 7L), ("c", 5L)
    ).map { case (k, p) => (k, ts(p)) }.toDF("k", "p")
    val build = Seq(
      ("a", 0L, 10L), ("a", 0L, 10L), ("a", 2L, 20L), ("a", 5L, 5L),
      ("a", 8L, 9L), ("b", 6L, 8L)
    ).map { case (k, l, h) => (k, ts(l), ts(h)) }.toDF("bk", "lo", "hi")

    val got = IntervalJoin.pointInInterval(
        probe, build, "p", "lo", "hi", Seq("k"), Seq("bk"))
      .select("k", "p", "lo", "hi")
    val expected = probe.join(build,
        $"k" === $"bk" && $"lo" <= $"p" && $"p" < $"hi")
      .select("k", "p", "lo", "hi")

    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(got.collect().map(key).sorted.toSeq ==
      expected.collect().map(key).sorted.toSeq)
    assert(got.count() == 8) // a@0:2, a@5:3 (zero-width excluded), a@10:1, a@15:1, b@7:1

    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PointInIntervalJoin"))
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("null points and bounds never match; keyless variant works") {
    IntervalJoin.install(spark)
    val probe = Seq(Some(1L), None, Some(7L)).map(_.map(ts))
      .toDF("p")
    val build = Seq((Some(0L), Some(5L)), (None, Some(9L)), (Some(6L), None))
      .map { case (l, h) => (l.map(ts), h.map(ts)) }.toDF("lo", "hi")
    val got = IntervalJoin.pointInInterval(probe, build, "p", "lo", "hi")
    assert(got.collect().map(r => (r.getTimestamp(0), r.getTimestamp(1))).toSeq ==
      Seq((ts(1), ts(0))))
  }

  test("integral and date bound types are supported") {
    IntervalJoin.install(spark)
    val probe = Seq(1, 5, 11).toDF("p").withColumn("p", $"p".cast("int"))
    val build = Seq((0, 6), (10, 12)).toDF("lo", "hi")
      .select($"lo".cast("int").as("lo"), $"hi".cast("int").as("hi"))
    val got = IntervalJoin.pointInInterval(probe, build, "p", "lo", "hi")
    assert(got.count() == 3)
  }
}
