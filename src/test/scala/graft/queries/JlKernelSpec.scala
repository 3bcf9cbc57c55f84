package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JlProjectF kernel parity: the one-pass map formulation of
  * jlReducedVectors must equal the retained explode→join→aggregate SQL
  * reference (jlReducedVectorsSql) ROW FOR ROW — vec_id set, every rv
  * element bit-exact, n2 bit-exact — on real corpora and on
  * float-typed input. This is the contract that lets the r17 kernel
  * swap-in leave every q56/q59 oracle untouched.
  */
class JlKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def assertParity(emb: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    def canon(df: org.apache.spark.sql.DataFrame): Array[(Long, Seq[Double], Double)] =
      df.orderBy("vec_id").collect().map { r =>
        (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))
      }
    val got = canon(Sampling.jlReducedVectors(emb, k))
    val want = canon(Sampling.jlReducedVectorsSql(emb, k))
    assert(got.length == want.length,
      s"row count ${got.length} != reference ${want.length}")
    got.zip(want).foreach { case ((idG, rvG, n2G), (idW, rvW, n2W)) =>
      assert(idG == idW)
      assert(rvG == rvW, s"rv mismatch at vec $idG")
      assert(n2G == n2W, s"n2 mismatch at vec $idG")
    }
  }

  test("kernel == SQL reference on sf0.001 embeddings, k=16") {
    assertParity(graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings"), 16)
  }

  test("kernel == SQL reference on sf0.01 embeddings, k=8") {
    assertParity(graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings"), 8)
  }

  test("kernel == SQL reference on a float-typed synthetic corpus") {
    import spark.implicits._
    // values engineered to exercise the clamp (outliers beyond the
    // common span land on 0/255) and a constant (zero-span) dimension
    val rows = (0L until 50L).map { id =>
      (id, Array.tabulate(7)(i =>
        if (i == 3) 1.25f
        else (math.sin(id * 13.7 + i) * (if (id == 7) 100 else 1)).toFloat))
    }
    assertParity(rows.toDF("vec_id", "embedding"), 5)
  }
}
