package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CappedCollect.collect_list_capped

/** collect_list_capped: exact collect_list semantics for groups at or
  * under the cap, a bounded (cap+1) truncated witness above it — the
  * aggregation-buffer budget behind the capped candidate generators
  * (lshCandidatePairs / hammingBandPairs), where a degenerate hot
  * bucket previously materialized its whole id list in one non-spilling
  * buffer before the size filter dropped it.
  */
class CappedCollectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("groups at or under the cap collect exactly (sorted parity with " +
      "collect_list), across partial/merge paths") {
    import spark.implicits._
    // 50 groups of sizes 1..50, values scattered over 8 input partitions
    // so map-side partial buffers MERGE on the reduce side
    val rows = for (g <- 1 to 50; i <- 1 to g) yield (g, g * 1000L + i)
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy(col("g"))
      .agg(sort_array(collect_list_capped(col("v"), 50)).as("capped"),
        sort_array(collect_list(col("v"))).as("plain"))
      .filter(col("capped") =!= col("plain"))
    assert(got.count() == 0, "capped must equal plain collect under the cap")
  }

  test("an over-cap group's buffer is bounded at cap+1 elements — a " +
      "detectable truncated witness, not the full list") {
    import spark.implicits._
    val cap = 16
    val hot = (1 to 5000).map(i => (1, i.toLong))
    val cold = (1 to 3).map(i => (2, i.toLong))
    val out = (hot ++ cold).toDF("g", "v").repartition(8)
      .groupBy(col("g"))
      .agg(collect_list_capped(col("v"), cap).as("vs"),
        count(lit(1)).as("n"))
      .select(col("g"), size(col("vs")).as("sz"), col("n"))
      .collect().map(r => (r.getInt(0), (r.getInt(1), r.getLong(2)))).toMap
    assert(out(1) == ((cap + 1, 5000L)),
      "hot group: truncated witness of cap+1, true size on the count")
    assert(out(2) == ((3, 3L)), "cold group: exact")
  }

  test("nulls are skipped, matching collect_list; struct elements " +
      "(the hammingBandPairs shape) round-trip serialize/merge") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Long)]((1, 10L), (1, null), (1, 12L))
      .toDF("g", "v")
    val vs = df.groupBy(col("g"))
      .agg(sort_array(collect_list_capped(col("v"), 8)).as("vs"))
      .select(col("vs")).as[Seq[Long]].head()
    assert(vs == Seq(10L, 12L))

    val structs = (1 to 40).map(i => (i % 4, i.toLong, s"h$i"))
      .toDF("g", "id", "h").repartition(7)
    val got = structs
      .select(col("g"), struct(col("id"), col("h")).as("m"))
      .groupBy(col("g"))
      .agg(sort_array(collect_list_capped(col("m"), 64)).as("capped"),
        sort_array(collect_list(col("m"))).as("plain"))
      .filter(col("capped") =!= col("plain"))
    assert(got.count() == 0)
  }
}
