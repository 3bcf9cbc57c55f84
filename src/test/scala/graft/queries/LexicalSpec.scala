package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the q50/q57 lexical family, independent of the
  * DuckDB oracles: hand-computed sparse cosines and the df-cap pruning
  * contract on tiny hand-built corpora.
  */
class LexicalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("sparseCosinePairs: hand-computed tf cosine") {
    // "a a b" = (2,1), "a b b" = (1,2): dot = 4, |v| = √5 → cosine 0.8
    // dfDenom = 1 keeps every term (df ≤ N).
    val d = docs((1L, "a a b"), (2L, "a b b"))
    val r = Lexical.sparseCosinePairs(d, 1).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("dot") == 4L)
    assert(r.head.getAs[Double]("cosine") == 0.8)
  }

  test("sparseCosinePairs: exact duplicates score exactly 1.0") {
    val d = docs(
      (1L, "x y z x"), (2L, "x y z x"), (3L, "p q r"))
    val r = Lexical.sparseCosinePairs(d, 1).collect()
    assert(r.length == 1) // only the duplicate pair shares any term
    assert(r.head.getAs[Long]("doc_a") == 1L)
    assert(r.head.getAs[Long]("doc_b") == 2L)
    assert(r.head.getAs[Double]("cosine") == 1.0)
  }

  test("sparseCosinePairs: relative max-df drops ubiquitous terms") {
    // 4 docs, dfDenom = 2 → keep df*2 ≤ 4, i.e. df ≤ 2. "the" (df 4)
    // is pruned before any pair forms, so docs sharing ONLY "the"
    // never meet; (1,2) pair on "rare", (3,4) on "common", and the
    // norms exclude the capped term too → both cosines exactly 1.0.
    val d = docs(
      (1L, "the rare"), (2L, "the rare"),
      (3L, "the common"), (4L, "the common"))
    val r = Lexical.sparseCosinePairs(d, 2)
      .orderBy("doc_a").collect()
    assert(r.map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b")))
      .toSeq == Seq((1L, 2L), (3L, 4L)))
    assert(r.forall(_.getAs[Double]("cosine") == 1.0))
    assert(r.forall(_.getAs[Long]("dot") == 1L))
  }
}
