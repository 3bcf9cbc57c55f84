package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin contract, with the inclusive-vs-strict tie semantics the
  * q49 feature-store family depends on: a right (feature) row stamped
  * at EXACTLY the left (label) time is visible in inclusive mode and
  * invisible in strict mode — the point-in-time-correctness boundary.
  * Both modes are checked against a brute-force per-row scan.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (key, t, leftId) probes / (key, t, value) references, with exact
  // ties at t=20 on key "a" and t=30 on key "b", keys with no match,
  // and a key present only on the right.
  private def fixtures = {
    import spark.implicits._
    val left = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 25L, 3L),
      ("b", 30L, 4L), ("b", 5L, 5L),
      ("c", 50L, 6L)).toDF("k", "t", "left_id")
    val right = Seq(
      ("a", 20L, "a@20"), ("a", 15L, "a@15"), ("a", 24L, "a@24"),
      ("b", 30L, "b@30"), ("b", 31L, "b@31"),
      ("d", 1L, "d@1")).toDF("k", "t", "v")
    (left, right)
  }

  private def brute(inclusive: Boolean): Map[Long, Option[String]] = {
    val (left, right) = fixtures
    val l = left.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val r = right.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    l.map { case (k, t, id) =>
      val cands = r.filter { case (rk, rt, _) =>
        rk == k && (if (inclusive) rt <= t else rt < t) }
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
  }

  private def run(inclusive: Boolean): Map[Long, Option[String]] = {
    val (left, right) = fixtures
    AsOfJoin(left, right, "k", "k", "t", "t",
      rightVals = Seq("v" -> "asof_v"), inclusive = inclusive)
      .select(col("left_id"), col("asof_v"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
  }

  test("inclusive mode attaches right rows at t <= left t (tie visible)") {
    val got = run(inclusive = true)
    assert(got == brute(inclusive = true))
    // the tie rows specifically: left a@20 sees right a@20, b@30 sees b@30
    assert(got(2L).contains("a@20"))
    assert(got(4L).contains("b@30"))
  }

  test("strict mode hides same-instant right rows (leakage-safe <)") {
    val got = run(inclusive = false)
    assert(got == brute(inclusive = false))
    // at the tie instants the strictly-earlier version wins instead
    assert(got(2L).contains("a@15"))
    // b's only versions are at 30 (tied, hidden) and 31 (later) -> null
    assert(got(4L).isEmpty)
    // no prior version at all -> null
    assert(got(5L).isEmpty)
  }
}
