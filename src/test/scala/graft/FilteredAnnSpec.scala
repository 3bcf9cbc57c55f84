package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q95_filtered_ann — metadata predicate + vector top-k, the
  * source-restricted retrieval shape. Contracts named here:
  *
  *   - the pre-filter path's label predicate reaches the parquet scan
  *     (PushedFilters — the require inside the query fails loudly
  *     otherwise, this spec re-asserts the emitted column);
  *   - the every-cell pre-filter score surface agrees with an
  *     independent re-scoring plan per row, within
  *     float-reassociation tolerance (exhaustive_exact);
  *   - post-filter ⊆ pre-filter under the same probes (the theorem:
  *     both paths rank identical ADC doubles, and a filtered row in
  *     post's final k survived the harsher all-labels top-k' cut);
  *   - the pre-filter never leaks an off-label row.
  */
class FilteredAnnSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("filtered ANN: pushdown-pruned pre-filter is exact, post-filter " +
      "is a subset of it, and counts are closed-form") {
    val row = SparkEntry.queries("q95_filtered_ann")(spark, sf).collect()(0)
    val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") =!= 0)
    val nCorpus = e.count()
    val nLabel = e.filter(col("label") === 3).count()
    assert(nLabel >= 1, "fixture precondition: label 3 is populated")
    assert(row.getAs[Long]("n_corpus") == nCorpus)
    assert(row.getAs[Long]("n_label") == nLabel)
    assert(row.getAs[Long]("n_exhaustive") == math.min(10L, nLabel),
      "the every-cell pre-filter serves min(k, |filtered|) — the " +
        "filter can never starve it below the subset size")
    assert(row.getAs[Boolean]("exhaustive_exact"),
      "LutSumF scoring and the posexplode/join/sum re-scoring must " +
        "agree per row within float-reassociation tolerance across " +
        "the WHOLE filtered score surface")
    assert(row.getAs[Boolean]("filter_pushed"),
      "EqualTo(label, …) must appear in the codes scan's PushedFilters")
    assert(row.getAs[Boolean]("pre_all_labeled"),
      "the pre-filter path must never leak an off-label row")
    assert(row.getAs[Boolean]("post_subset_of_pre"),
      "same probes + same ADC doubles: any filtered row surviving the " +
        "all-labels top-k' cut is among the best filtered rows")
  }
}
