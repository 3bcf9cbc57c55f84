package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmOps

/** The over-full-bucket cap in LSH candidate generation: a degenerate
  * band key (many identical docs → one bucket) must NOT emit d(d-1)/2
  * candidate pairs, and the drop must be surfaced as observed metrics
  * rather than silently shrinking recall.
  */
class LshBucketCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A corpus where `nDup` docs share one shingle set (they land in the
    * same bucket in EVERY band — the degenerate boilerplate case) plus
    * one small legitimate near-dup bucket (two identical docs) that
    * must SURVIVE the cap. The survivor also keeps the candidate stream
    * non-empty, which matters: AQE's empty-relation propagation erases
    * the CollectMetrics node when every bucket is dropped (probed on
    * Spark 4.1 — see the lshCandidatePairs scaladoc).
    */
  private def degenerateCorpus(nDup: Int) = {
    import spark.implicits._
    val dup = (1 to nDup).map(i =>
      (i.toLong, "the same boilerplate text repeated verbatim everywhere"))
    val pair = Seq(
      (10001L, "completely different first document about rivers and streams"),
      (10002L, "completely different first document about rivers and streams"))
    (dup ++ pair).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.WordShingles.word_shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  test("uncapped degenerate bucket emits quadratic candidates; cap bounds it") {
    val shingled = degenerateCorpus(40)
    // headroom cap above bucket size: all 40*39/2 boilerplate pairs
    // plus the one legitimate pair
    val uncapped =
      LlmOps.lshCandidatePairs(shingled, bands = 4, rows = 4, maxBucket = 1000)
    assert(uncapped.count() == 40L * 39 / 2 + 1)
    // cap below the degenerate bucket size: only the legitimate pair
    val capped =
      LlmOps.lshCandidatePairs(shingled, bands = 4, rows = 4, maxBucket = 16)
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10001L, 10002L)))
  }

  test("drop count is surfaced via observed metrics") {
    val shingled = degenerateCorpus(40)
    val obs = org.apache.spark.sql.Observation("lsh_cap_test")
    LlmOps.lshCandidatePairs(shingled, bands = 4, rows = 4, maxBucket = 16,
      obs = Some(obs)).count()
    val m = obs.get
    // 4 bands, the 40 identical docs collide in all of them → 4 dropped
    // buckets of 40 docs each
    assert(m("lsh_buckets_dropped") == 4L, m.toString)
    assert(m("lsh_docs_in_dropped") == 160L, m.toString)
  }

  test("real corpus: default cap drops nothing and q23 recall is unchanged") {
    val sf = "/root/testdata/sf0.001"
    val shingled = LlmOps.shingledDocs(spark, sf)
    val default = LlmOps.lshCandidatePairs(shingled, bands = 16, rows = 8)
    val unbounded = LlmOps.lshCandidatePairs(shingled, bands = 16, rows = 8,
      maxBucket = Int.MaxValue)
    assert(default.count() == unbounded.count(),
      "the default cap must not fire on the non-degenerate test corpus")
  }
}
