package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GlobalIndex must equal the single-partition `row_number` window for
  * any total sort key, at any partition count, and be deterministic
  * across runs — that is the whole contract that lets it replace the
  * window at scale.
  */
class GlobalIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample = {
    import spark.implicits._
    // Deterministic pseudo-random keys, including ties on `k` so the
    // id tiebreaker matters, spread over 7 input partitions.
    (1L to 500L).map(i => (i, (i * 2654435761L) % 97, s"s${i % 13}"))
      .toDF("id", "k", "s")
      .repartition(7)
  }

  private def windowed = sample
    .withColumn("pos",
      row_number().over(Window.orderBy(col("k"), col("s"), col("id")))
        .cast("long"))
    .select("id", "pos")

  test("matches single-partition row_number at several partition counts") {
    val expect = windowed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(1, 3, 8)) {
      val got = GlobalIndex
        .withPosition(sample, Seq(col("k"), col("s"), col("id")), "pos", p)
        .select("id", "pos")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"mismatch at numPartitions=$p")
    }
  }

  test("positions are dense, 1-based, and deterministic across runs") {
    def run() = GlobalIndex
      .withPosition(sample, Seq(col("k"), col("s"), col("id")), "pos", 5)
      .select("id", "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.map(_._2).sorted == (1L to 500L))
  }

  test("plans one range shuffle and a broadcast offset join — no global sort") {
    val df = GlobalIndex.withPosition(sample, Seq(col("k"), col("id")), "pos", 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "expected the single range repartition of the input")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "expected the offsets table to broadcast, not shuffle")
    // the cliff this operator exists to avoid: a full-data single-partition
    // exchange (what a global row_number window would plan). The only
    // SinglePartition exchanges allowed are the ones whose child is the
    // per-partition-count HashAggregate — ≤ numPartitions rows.
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1)
          .find(l => l.contains("+-") || l.contains(":-")).getOrElse("")
        assert(child.contains("HashAggregate") && child.contains("_gi_pid"),
          s"full-data SinglePartition exchange at line $i in:\n$plan")
      }
  }

  test("withRunningTotal matches the single-window prefix sum") {
    val w = Window.orderBy(col("k"), col("id"))
    val expect = sample
      .withColumn("v", (col("id") % 7).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "pos", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (p <- Seq(1, 4)) {
      val got = GlobalIndex
        .withRunningTotal(
          sample.withColumn("v", (col("id") % 7).cast("long")),
          Seq(col("k"), col("id")), "v", "pos", "cum", p)
        .select("id", "pos", "cum")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"mismatch at numPartitions=$p")
    }
  }

  test("withRunningTotal supports descending sort keys") {
    val got = GlobalIndex
      .withRunningTotal(
        sample.withColumn("v", lit(1L)),
        Seq(col("k").desc, col("id").asc), "v", "pos", "cum", 3)
      .select("pos", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // with v = 1 everywhere, cum must equal pos at every row
    assert(got.forall { case (p, c) => p == c })
    assert(got.keySet == (1L to 500L).toSet)
  }

  test("keeps all original columns") {
    val out = GlobalIndex.withPosition(sample, Seq(col("id")), "pos", 3)
    assert(out.columns.toSet == Set("id", "k", "s", "pos"))
    assert(out.count() == 500)
  }

  test("withRunningTotals: several columns in one pass equal one pass each") {
    val in = sample
      .withColumn("v1", (col("id") % 7).cast("long"))
      .withColumn("v2", (col("id") % 3).cast("long"))
    val sort = Seq(col("k"), col("id"))
    val both = GlobalIndex
      .withRunningTotals(in, sort, Seq("v1", "v2"), "pos",
        Seq("c1", "c2"), 4)
      .select("id", "pos", "c1", "c2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val one = GlobalIndex.withRunningTotal(in, sort, "v1", "pos", "c1", 4)
    val other = GlobalIndex.withRunningTotal(in, sort, "v2", "pos2", "c2", 4)
    val expect = one.select("id", "pos", "c1")
      .join(other.select("id", "c2"), "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(both == expect)
  }
}
