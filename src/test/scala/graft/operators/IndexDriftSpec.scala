package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The retrain-trigger contract behind q76: an in-distribution append
  * must NOT demand a retrain, a deliberately drifted append MUST, and
  * the PSI statistic itself must order the two decisively (not squeak
  * past the threshold).
  */
class IndexDriftSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("occupancy PSI fires on a drifted batch and stays quiet in-dist") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val drifted = IndexDrift.shifted(batch, "vec_id", "embedding")
    val coarse = graft.queries.LlmOps.ivfCentroids(spark, sf, base)

    val inD = IndexDrift.retrainTrigger(
      base, batch, "vec_id", "embedding", coarse).collect().head
    val dr = IndexDrift.retrainTrigger(
      base, drifted, "vec_id", "embedding", coarse).collect().head

    assert(!inD.getAs[Boolean]("retrain_needed"),
      s"in-dist batch must not trigger (psi=${inD.getAs[Double]("psi")})")
    assert(dr.getAs[Boolean]("retrain_needed"),
      s"drifted batch must trigger (psi=${dr.getAs[Double]("psi")})")
    val psiIn = inD.getAs[Double]("psi")
    val psiDr = dr.getAs[Double]("psi")
    assert(psiDr > 2 * psiIn,
      s"drift must dominate sampling noise decisively: $psiDr vs $psiIn")
    assert(inD.getAs[Long]("n_batch") == dr.getAs[Long]("n_batch"))
  }

  test("PSI of a batch against itself is ~0 (statistic sanity)") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val coarse = graft.queries.LlmOps.ivfCentroids(spark, sf, e)
    val self = IndexDrift.occupancyPsi(
      e, e, "vec_id", "embedding", coarse).collect().head
    assert(math.abs(self.getAs[Double]("psi")) < 1e-12)
  }
}
