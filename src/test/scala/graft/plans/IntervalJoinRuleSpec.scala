package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The natural-SQL containment-join rewrite: fires on the supported
  * shape, is exact against the unrewritten plan (including BETWEEN's
  * inclusive upper bound and null keys), and leaves other joins alone.
  */
class IntervalJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    IntervalJoin.install(s)
    s
  }

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def mkTables(): Unit = {
    Seq(("a", Some(1L)), ("a", Some(5L)), ("b", Some(7L)), (null, Some(3L)),
      ("a", None))
      .map { case (k, p) => (k, p.map(ts).orNull) }
      .toDF("k", "p").createOrReplaceTempView("probe_t")
    Seq(("a", 0L, 4L), ("a", 4L, 6L), ("b", 6L, 8L), (null, 0L, 9L))
      .map { case (k, l, h) => (k, ts(l), ts(h)) }
      .toDF("bk", "lo", "hi").createOrReplaceTempView("build_t")
  }

  test("rewrite fires on keyed half-open containment SQL and is exact") {
    mkTables()
    val q = spark.sql(
      """SELECT p.k, p.p, b.lo FROM probe_t p JOIN build_t b
        |  ON p.k = b.bk AND p.p >= b.lo AND p.p < b.hi""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("PointInIntervalJoin"))
    val rows = q.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(rows.length == 3) // a@1 in [0,4), a@5 in [4,6), b@7 in [6,8)
    assert(!rows.exists(_.startsWith("null")), "null keys must never match")
  }

  test("BETWEEN phrasing keeps the inclusive upper bound") {
    mkTables()
    val q = spark.sql(
      """SELECT p.k, b.lo FROM probe_t p JOIN build_t b
        |  ON p.k = b.bk AND p.p BETWEEN b.lo AND b.hi""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("PointInIntervalJoin"))
    // p=5 now matches both [0,4]... no: 5>4; matches [4,6]; hi-inclusive
    // adds the p=4-style boundary; here a@1->[0,4], a@5->[4,6], b@7->[6,8]
    assert(q.count() == 3)
    // boundary check: a probe exactly at hi matches only when inclusive
    Seq(("a", ts(4L))).toDF("k", "p").createOrReplaceTempView("edge_t")
    val half = spark.sql(
      """SELECT * FROM edge_t e JOIN build_t b
        |  ON e.k = b.bk AND e.p >= b.lo AND e.p < b.hi""".stripMargin)
    val incl = spark.sql(
      """SELECT * FROM edge_t e JOIN build_t b
        |  ON e.k = b.bk AND e.p BETWEEN b.lo AND b.hi""".stripMargin)
    assert(half.count() == 1) // [4,6) only
    assert(incl.count() == 2) // [0,4] and [4,6]
  }

  test("non-containment joins are left alone") {
    mkTables()
    val q = spark.sql(
      """SELECT * FROM probe_t p JOIN build_t b
        |  ON p.k = b.bk AND p.p >= b.lo""".stripMargin) // no upper bound
    assert(!q.queryExecution.executedPlan.toString.contains("PointInIntervalJoin"))
    val q2 = spark.sql(
      """SELECT * FROM probe_t p JOIN build_t b
        |  ON p.k = b.bk AND p.p >= b.lo AND p.p < b.hi AND p.p <> b.lo""".stripMargin)
    assert(!q2.queryExecution.executedPlan.toString.contains("PointInIntervalJoin"),
      "residual conjunct must prevent the rewrite")
  }

  test("reversed sides (point on the right) still rewrite, output order kept") {
    mkTables()
    val q = spark.sql(
      """SELECT b.bk, p.p FROM build_t b JOIN probe_t p
        |  ON p.k = b.bk AND p.p >= b.lo AND p.p < b.hi""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("PointInIntervalJoin"))
    assert(q.columns.toSeq == Seq("bk", "p"))
    assert(q.count() == 3)
  }
}
