package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Structural invariants of the time-series queries beyond the value
  * hash: bar ordering (low <= open/close <= high), spine completeness,
  * and growth-curve conservation.
  */
class TimeSeriesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ohlc bars: low <= open, close <= high; counts positive") {
    val rows = SparkEntry.queries("q42_ohlc_bars")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (open, high, low, close, n) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))
      assert(low <= open && open <= high, s"open outside [low, high]: $r")
      assert(low <= close && close <= high, s"close outside [low, high]: $r")
      assert(n > 0)
    }
  }

  test("gapfill: spine is complete and totals are conserved") {
    val rows = SparkEntry.queries("q42_gapfill")(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val hours = rows.map(_.getTimestamp(1)).distinct.length
    assert(rows.length == types * hours,
      s"spine not complete: ${rows.length} != $types x $hours")
    val total = rows.map(_.getLong(2)).sum
    val expected = graft.Tables.load(spark, sf, "events").count()
    assert(total == expected, s"gapfill lost events: $total != $expected")
    assert(rows.exists(_.getLong(2) == 0L),
      "no empty hours at this sf — spine assertion is vacuous")
  }

  test("cumulative uniques: monotone, ends at total distinct users") {
    val rows = SparkEntry.queries("q42_cum_uniques")(spark, sf).collect()
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b || a == b })
    val totalUsers = graft.Tables.load(spark, sf, "events")
      .select(countDistinct("user_id")).collect().head.getLong(0)
    assert(cums.last == totalUsers)
    assert(rows.map(_.getLong(1)).sum == totalUsers,
      "daily new-user counts don't sum to the total")
  }

  test("retention: week-0 activity equals cohort size") {
    val rows = SparkEntry.queries("q42_retention")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every user is active in their cohort week by definition, so the
    // week_offset=0 cell is the cohort's full size and is the max cell
    rows.groupBy(_._1).foreach { case (cohort, cells) =>
      val w0 = cells.find(_._2 == 0L)
      assert(w0.isDefined, s"cohort $cohort missing week-0 cell")
      assert(cells.forall(_._3 <= w0.get._3),
        s"cohort $cohort has a cell above its week-0 size")
    }
  }
}
