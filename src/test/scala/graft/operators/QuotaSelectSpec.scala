package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** QuotaSelect must select exactly the rows the whole-group window
  * formulation selects — groups smaller than, equal to, and larger
  * than their quota, under heavy group skew — while only ever ranking
  * inside (group, bucket) windows.
  */
class QuotaSelectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Skewed corpus: group a has 1000 rows, b has 40, c has 3.
  private def sample = {
    import spark.implicits._
    ((1L to 1000L).map(i => (i, "a")) ++
      (2001L to 2040L).map(i => (i, "b")) ++
      Seq((3001L, "c"), (3002L, "c"), (3003L, "c")))
      .toDF("id", "g")
      .withColumn("key", md5(col("id").cast("string")))
      .repartition(5)
  }

  private def quotas(q: (String, Long)*) = {
    import spark.implicits._
    q.toDF("g", "quota")
  }

  private def windowed(qs: Seq[(String, Long)]) = {
    val w = Window.partitionBy(col("g")).orderBy(col("key"), col("id"))
    val quotaExpr = qs.foldLeft(lit(-1L)) { case (acc, (g, q)) =>
      when(col("g") === g, q).otherwise(acc)
    }
    sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quotaExpr)
      .select("id")
  }

  test("matches the whole-group window under, at, and over quota") {
    val qs = Seq("a" -> 137L, "b" -> 40L, "c" -> 10L)
    val expect = windowed(qs).collect().map(_.getLong(0)).toSet
    val got = QuotaSelect
      .select(sample, "g", "key", "id", quotas(qs: _*))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.size == 137 + 40 + 3)
  }

  test("drops groups absent from the quota table, keeps payload columns") {
    val out = QuotaSelect.select(sample, "g", "key", "id", quotas("c" -> 2L))
    assert(out.columns.toSet == Set("id", "g", "key"))
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("g") == "c"))
  }

  test("is deterministic across runs") {
    val qs = quotas("a" -> 500L, "b" -> 7L, "c" -> 1L)
    def run() = QuotaSelect.select(sample, "g", "key", "id", qs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(run() == run())
  }

  test("every window in the plan is bucket-scoped, never whole-group") {
    val df = QuotaSelect
      .select(sample, "g", "key", "id", quotas("a" -> 137L, "b" -> 40L))
    df.collect()
    val windowLines = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty)
    // the data-bearing window partitions by (g, _qs_b); the cumulative
    // window runs over the ≤ groups×256 bucket table, also keyed by g —
    // what must NEVER appear is a row_number over g alone
    windowLines.filter(_.contains("row_number"))
      .foreach(l => assert(l.contains("_qs_b"), s"whole-group rank: $l"))
  }
}
