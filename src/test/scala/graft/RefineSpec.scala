package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantizer

/** q96 — two-stage retrieval (ADC candidates → exact re-rank).
  * Contracts named here:
  *
  *   - the refine guarantee is a theorem on every instance, not a
  *     tendency: with the same total order (distance, vec_id) used
  *     everywhere, every exact-top-k member that survives stage 1 is
  *     in the refined top-k, so refine recall ≥ ADC recall
  *     (gt_cands_refined + refine_ge_adc);
  *   - the refine stage ranks by EXACT distance, not by the stage-1
  *     ADC score — proven mechanically on a planted candidate set
  *     whose ADC order is the REVERSE of the exact order;
  *   - the serve path's candidate fetch is a rowgroup-pruned scan
  *     (id-range bracket in PushedFilters — the require inside the
  *     query fails loudly otherwise).
  */
class RefineSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("refine ranks by exact distance: a candidate set whose ADC " +
      "order is reversed comes back in true-distance order") {
    val s = spark
    import s.implicits._
    // raw vectors at distances 0.1 < 0.5 < 1.0 from the origin query;
    // the planted ADC scores rank them in exactly the OPPOSITE order
    val raw = Seq(
      (1L, Array(0.1f, 0.0f)),
      (2L, Array(0.5f, 0.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cands = Seq((3L, 0.1), (2L, 0.2), (1L, 0.3))
      .toDF("vec_id", "adc_dist")
    val query = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("embedding")
    val got = ProductQuantizer.exactRerank(cands, raw,
        "vec_id", "embedding", query, "embedding", 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L),
      "refine must rank by true squared L2 (1 then 2), discarding the " +
        s"planted reversed ADC order — got $got")
  }

  test("refine never drops a candidate the exact order prefers: k = " +
      "full candidate size returns all of them, exact-ordered") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      (7L, Array(0.3f, 0.4f)), // |.|² = 0.25
      (8L, Array(0.0f, 0.1f)), // 0.01
      (9L, Array(1.0f, 1.0f))) // 2.0
      .toDF("vec_id", "embedding")
    val cands = Seq(7L, 8L, 9L).toDF("vec_id")
    val query = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("embedding")
    val got = ProductQuantizer.exactRerank(cands, raw,
        "vec_id", "embedding", query, "embedding", 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(8L, 7L, 9L))
  }

  test("q96_ann_refine: both theorem halves hold against brute-force " +
      "ground truth, and the two distance plans agree per row") {
    val row = SparkEntry.queries("q96_ann_refine")(spark, sf).collect()(0)
    val nCorpus = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getAs[Long]("n_corpus") == nCorpus)
    assert(row.getAs[Long]("n_results") == math.min(10L, nCorpus))
    assert(row.getAs[Boolean]("cand_bounded"),
      "stage 1 must return at most m candidates")
    assert(row.getAs[Boolean]("gt_cands_refined"),
      "every exact-top-k member inside the candidate set must be in " +
        "the refined top-k (same total order everywhere)")
    assert(row.getAs[Boolean]("refine_ge_adc"),
      "refine recall must be >= ADC recall on this instance — the " +
        "theorem, not an average")
    assert(row.getAs[Boolean]("exact_plan_agrees"),
      "norm-expansion and zip_with-fold distances must agree per row " +
        "within float-reassociation tolerance")
    assert(row.getAs[Boolean]("finite_ok"))
  }

  test("q96_refine_serve: pruned fetch + bounded exact top-k") {
    val row = SparkEntry.queries("q96_refine_serve")(spark, sf).collect()(0)
    for (c <- Seq("k_bounded", "finite_ok", "nonneg_ok", "cand_bounded",
        "fetch_pruned"))
      assert(row.getAs[Boolean](c), s"$c must hold")
  }
}
