package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmOps

/** The over-full-bucket cap in Hamming-banded candidate generation
  * (the image tier's q72 path): a band key is only 16 bits, so a hot
  * key — identical or near-identical hashes at corpus scale — must NOT
  * emit d(d-1)/2 candidate pairs per band, and the drop must surface as
  * observed metrics, exactly like the MinHash text tier
  * (LshBucketCapSpec). An uncapped band join is O(n²/2^16) on a uniform
  * corpus — the shape this cap exists to forbid.
  */
class HammingBandCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** `nDup` assets share ONE hash (collide in all 4 bands — the
    * boilerplate-image case) plus one legitimate near-dup pair at
    * Hamming 2 that must SURVIVE the cap, plus one far-away singleton.
    */
  private def degenerateCorpus(nDup: Int) = {
    import spark.implicits._
    val hot = 0x1234_5678_9abc_def0L
    val dup = (1 to nDup).map(i => (i.toLong, hot))
    val legit = Seq(
      (10001L, 0x0f0f_0f0f_0f0f_0f0fL),
      (10002L, 0x0f0f_0f0f_0f0f_0f0cL)) // Hamming 2, same top 3 bands
    val lone = Seq((20001L, 0x7777_0000_7777_0000L))
    (dup ++ legit ++ lone).toDF("asset_id", "dhash")
  }

  test("uncapped hot bucket emits quadratic candidates; cap bounds it") {
    val hashed = degenerateCorpus(40)
    val uncapped = LlmOps.hammingBandPairs(
      hashed, "asset_id", "dhash", maxBucket = 1000)
    assert(uncapped.count() == 40L * 39 / 2 + 1)
    val capped = LlmOps.hammingBandPairs(
      hashed, "asset_id", "dhash", maxBucket = 16)
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10001L, 10002L)))
  }

  test("drop count is surfaced via observed metrics") {
    val hashed = degenerateCorpus(40)
    val obs = org.apache.spark.sql.Observation("hamming_cap_test")
    LlmOps.hammingBandPairs(hashed, "asset_id", "dhash", maxBucket = 16,
      obs = Some(obs)).count()
    val m = obs.get
    // identical hashes collide in all 4 bands → 4 dropped buckets of 40
    assert(m("hamming_buckets_dropped") == 4L, m.toString)
    assert(m("hamming_docs_in_dropped") == 160L, m.toString)
  }

  test("pigeonhole completeness: any Hamming<=3 pair is a candidate with both hashes") {
    import spark.implicits._
    // flip 3 bits in 3 DIFFERENT bands: only band 3 (bits 48-63) matches
    val a = 0x1111_2222_3333_4444L
    val b = a ^ (1L << 0) ^ (1L << 17) ^ (1L << 34)
    val hashed = Seq((1L, a), (2L, b)).toDF("asset_id", "dhash")
    val rows = LlmOps.hammingBandPairs(hashed, "asset_id", "dhash").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert((r.getLong(2), r.getLong(3)) == (a, b),
      "both hashes must ride the candidate row (verify needs no join back)")
  }

  test("q72 fixture corpus: default cap drops nothing") {
    // the real q72 drive at sf0.001 — its motif buckets are far below
    // the cap, so capped and unbounded candidate sets must coincide
    val sf = "/root/testdata/sf0.001"
    val q72 = graft.SparkEntry.queries("q72_image_neardup_hamming")
    val viaQuery = q72(spark, sf).collect()
    val oracle = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 2)
      .groupBy((col("doc_id") % 16).as("m"))
      .agg(min(col("doc_id")).as("cluster_rep"), count(lit(1)).as("n_members"))
      .select(col("cluster_rep"), col("n_members"))
      .orderBy("cluster_rep").collect()
    assert(viaQuery.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      oracle.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
