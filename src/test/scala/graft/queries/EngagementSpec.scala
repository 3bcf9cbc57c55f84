package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Invariants of the q52 behavioral-weighting family beyond the value
  * hash: the integer-exactness claim behind the decay encoding, a naive
  * recomputation of the decay sum, and the Markov matrix's conservation
  * laws.
  */
class EngagementSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decay score: score * 2^29 is an exact integer (the encoding claim)") {
    val rows = SparkEntry.queries("q52_decay_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(2)
      val scaled = score * 536870912.0
      assert(scaled == math.rint(scaled),
        s"decay_score not a multiple of 2^-29: $r")
      assert(score > 0.0 && score <= r.getLong(1).toDouble,
        s"score outside (0, n_recent]: $r")
    }
  }

  test("decay score equals a naive per-event recomputation") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("date").cast("string").as("d"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val cutoff = ev.map(_._2).maxBy(_.toEpochDay)
    val expected = ev
      .map { case (u, d) =>
        (u, java.time.temporal.ChronoUnit.DAYS.between(d, cutoff).toInt) }
      .filter { case (_, age) => age >= 0 && age < 30 }
      .groupBy(_._1)
      .map { case (u, ages) =>
        u -> ages.map { case (_, a) => 1L << (29 - a) }.sum / 536870912.0 }
    val got = SparkEntry.queries("q52_decay_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, s) =>
      assert(got(u) == s, s"user $u: got ${got(u)}, naive $s") }
  }

  test("markov transitions: probabilities row-normalize, counts conserve") {
    val rows = SparkEntry.queries("q52_markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4,
        s"row $from probabilities sum to $pSum")
      rs.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    }
    // Σ transition counts = N_events - N_users-with-events: each user
    // stream of length k contributes exactly k-1 edges.
    val events = graft.Tables.load(spark, sf, "events")
    val n = events.count()
    val u = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == n - u,
      s"transition mass != N - U (${rows.map(_.getLong(2)).sum} vs ${n - u})")
  }
}
