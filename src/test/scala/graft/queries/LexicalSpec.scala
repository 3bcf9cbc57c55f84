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

  test("sparseCosinePairs: empty when pruning removes the whole vocabulary") {
    // The round-6 regression shape: every term ubiquitous → no pairs,
    // not an error (and not a silent mis-prune of only some terms).
    val d = docs((1L, "the of"), (2L, "the of"), (3L, "the of"))
    assert(Lexical.sparseCosinePairs(d, 2).isEmpty)
  }

  test("sparseCosinePairs equals a brute-force model on random corpora") {
    // Seeded random corpora over a small alphabet vs a straight-line
    // in-memory tf-cosine model with the same relative max-df pruning
    // and the same HALF_UP round-6 — dot exact, cosine bit-equal.
    val rnd = new scala.util.Random(20260813L)
    val words = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 12) {
      val n = 2 + rnd.nextInt(6)
      val dfDenom = 1 + rnd.nextInt(3)
      val corpus = (1 to n).map { id =>
        val len = 1 + rnd.nextInt(12)
        (id.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val tf = corpus.map { case (id, text) =>
        id -> text.split(" ").groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      }.toMap
      val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, xs) => w -> xs.size }
      val kept = df.collect { case (w, d) if d.toLong * dfDenom <= n => w }.toSet
      val pruned = tf.map { case (id, m) => id -> m.filter(kw => kept(kw._1)) }
      val expect = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        dot = pruned(a).keySet.intersect(pruned(b).keySet).toSeq
          .map(w => pruned(a)(w) * pruned(b)(w)).sum
        if dot > 0
      } yield {
        def n2(id: Long) = pruned(id).values.map(v => v * v).sum
        val cos = dot.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
        val rounded = BigDecimal(cos)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, dot, rounded)
      }).toSet
      import spark.implicits._
      val got = Lexical.sparseCosinePairs(
          corpus.toDF("doc_id", "text"), dfDenom)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("dot"), r.getAs[Double]("cosine"))).toSet
      assert(got == expect, s"n=$n dfDenom=$dfDenom")
    }
  }
}
