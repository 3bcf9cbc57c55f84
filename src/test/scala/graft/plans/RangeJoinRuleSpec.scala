package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoinRule must turn naive bounded time-range joins — written as the
  * user would write them, `b.ts > a.ts AND b.ts <= a.ts + INTERVAL` — into
  * bucketed equi-joins, without changing results, and must leave
  * non-matching joins alone.
  */
class RangeJoinRuleSpec extends AnyFunSuite {

  // plain session first: it owns the SparkContext and provides ground truth
  lazy val plain: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val spark: SparkSession = {
    plain // force creation order
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def makeEvents(s: SparkSession): Unit = {
    import s.implicits._
    val rows = (1 to 3000).map { i =>
      val ts = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-01T00:00:00Z")
          .plusSeconds((i * 2971L) % 259200)) // ~3 days, pseudo-random order
      (i.toLong, ts, s"t${i % 3}")
    }
    rows.toDF("id", "ts", "typ").createOrReplaceTempView("rj_events")
  }

  private val naiveSql =
    """SELECT a.typ AS typ, count(*) AS n
      |FROM rj_events a JOIN rj_events b
      |  ON a.typ = b.typ AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val pureRangeSql =
    """SELECT count(*) AS n
      |FROM rj_events a JOIN rj_events b
      |  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE""".stripMargin

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("rewritten range join matches the naive join's results exactly") {
    makeEvents(plain); makeEvents(spark)
    val want = plain.sql(naiveSql).collect().map(_.toString).toSeq
    val got = spark.sql(naiveSql).collect().map(_.toString).toSeq
    assert(got == want)
    assert(want.nonEmpty && want != Seq("[t0,0]", "[t1,0]", "[t2,0]"))
  }

  test("rule fires: bucket keys appear in the optimized plan") {
    makeEvents(spark)
    val opt = spark.sql(naiveSql).queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_range_bucket"), opt)
  }

  test("pure range join (no equi keys) avoids nested-loop execution") {
    makeEvents(plain); makeEvents(spark)
    val df = spark.sql(pureRangeSql)
    val plan = executedPlan(df)
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      plan.toString)
    assert(df.collect().head.getLong(0) ==
      plain.sql(pureRangeSql).collect().head.getLong(0))
  }

  test("mirrored predicate orientations rewrite and match too") {
    makeEvents(plain); makeEvents(spark)
    // a.ts < b.ts form for the lower bound, a.ts + w >= b.ts for the upper
    val mirrored =
      """SELECT a.typ AS typ, count(*) AS n
        |FROM rj_events a JOIN rj_events b
        |  ON a.typ = b.typ AND a.ts < b.ts AND a.ts + INTERVAL 10 MINUTE >= b.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin
    val opt = spark.sql(mirrored).queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_range_bucket"), opt)
    assert(spark.sql(mirrored).collect().map(_.toString).toSeq ==
      plain.sql(mirrored).collect().map(_.toString).toSeq)
  }

  test("unbounded or month-interval ranges are not rewritten") {
    makeEvents(spark)
    val monthly =
      """SELECT count(*) FROM rj_events a JOIN rj_events b
        |  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MONTH""".stripMargin
    val opt = spark.sql(monthly).queryExecution.optimizedPlan.toString
    assert(!opt.contains("__graft_range_bucket"), opt)
  }

  test("plain equi joins are left untouched") {
    makeEvents(spark)
    val opt = spark.sql(
      """SELECT count(*) AS n FROM rj_events a JOIN rj_events b ON a.id = b.id""")
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("__graft_range_bucket"), opt)
  }
}
