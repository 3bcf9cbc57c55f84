package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q93 — time-travel serving from the durable switch log: serving as
  * of any past generation reconstructs EXACTLY (row-identical to a
  * one-shot re-encode under the as-of pointer's persisted models)
  * because every serving decision the family ever made lives in
  * overwrite-keyed storage. Also pins the audit/trigger cost split:
  * `pointerAsOf` may read O(adoptions) records, the CURRENT pointer
  * stays one read.
  */
class IndexAsOfSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("serving as of G ∈ {2, 4, 6} reconstructs exactly on the " +
      "pointer active at each G — base model, first retrain, second " +
      "retrain — with closed-form coverage") {
    val row = StreamOps.indexServeAsOf(spark, sf).collect()(0)
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val nBase = emb.filter(!pmod(col("vec_id"), lit(10)).isin(8, 9)).count()
    def slices(rs: Int*): Long =
      emb.filter(pmod(col("vec_id"), lit(60)).isin(rs.map(Int.box): _*))
        .count()
    assert(row.getAs[Long]("n_asof_2") == nBase + slices(8, 18),
      "as of gen 2: base corpus + the first two arrival slices")
    assert(row.getAs[Boolean]("asof_2_on_base"),
      "gen 2 predates every switch — the as-of pointer is the base model")
    assert(row.getAs[Boolean]("asof_2_exact"),
      "row-identical to a one-shot encode under the base models")
    assert(row.getAs[Long]("n_asof_4") == nBase + slices(8, 18, 28, 38))
    assert(row.getAs[Boolean]("asof_4_on_first_retrain"),
      "gen 4 sits between the two adoptions — retrain #1's pointer")
    assert(row.getAs[Boolean]("asof_4_exact"),
      "snapshot codes + appends 3-4, all under retrain #1's persisted " +
        "models — internally consistent by old-pointer-until-adopted")
    assert(row.getAs[Long]("n_asof_6") ==
      nBase + emb.filter(pmod(col("vec_id"), lit(10)) === 8).count())
    assert(row.getAs[Boolean]("asof_6_on_second_retrain"))
    assert(row.getAs[Boolean]("asof_6_exact"))
    assert(row.getAs[Boolean]("ids_unique"))
    assert(row.getAs[Long]("n_results") == 10)
  }

  test("cost split: the as-of pointer is the AUDIT path (reads up to " +
      "the answer's position), the current pointer stays one read") {
    // durable state from the query above (same scratch key, same JVM);
    // rebuilt here if this test runs alone
    val sroot = graft.RunPaths.scratch(
      s"graft_q93_index_${graft.RunPaths.keyFor(sf)}") + "/switch"
    if (SwitchLog.adopted(spark, sroot).isEmpty)
      StreamOps.indexServeAsOf(spark, sf).collect()
    assert(SwitchLog.adopted(spark, sroot) == Seq(2L, 5L))
    val r0 = SwitchLog.recordReads(sroot)
    assert(SwitchLog.pointer(spark, sroot).contains((5L, 5L)))
    assert(SwitchLog.recordReads(sroot) == r0 + 1,
      "the trigger-path pointer reads ONE record with 2 switches down")
    assert(SwitchLog.pointerAsOf(spark, sroot, 4L).contains((2L, 2L)))
    assert(SwitchLog.recordReads(sroot) == r0 + 3,
      "the audit path reads up to the answer's position plus the " +
        "first record past it (2 here) — bounded by O(adoptions), " +
        "and never on a trigger")
  }
}
