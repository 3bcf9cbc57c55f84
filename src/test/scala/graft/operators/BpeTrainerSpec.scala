package graft.operators

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BpeTrainer checked against a naive in-memory BPE implementation:
  * the distributed loop must pick the same merges (same pairs, same
  * frequencies, same tie-breaks) as the obvious sequential algorithm.
  */
class BpeTrainerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Sequential reference: greedy left-to-right merge application,
    * argmax by (freq desc, lhs asc, rhs asc).
    */
  private def naive(words: Map[String, Long], n: Int): Seq[(Long, String, String, Long)] = {
    var vocab = words.toVector.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val out = Vector.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= n && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, c) <- vocab; k <- 0 until syms.length - 1)
        counts((syms(k), syms(k + 1))) += c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
        out += ((rank, l, r, f))
        vocab = vocab.map { case (syms, c) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), c)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def trained(words: Map[String, Long], n: Int) = {
    import spark.implicits._
    val wc = words.toSeq.toDF("w", "cnt")
    BpeTrainer.train(spark, wc, n)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("hand case: repeated-char runs merge greedily, not overlapping") {
    // "aaaa" x3: pairs (a,a) counted 3x3=9; after merge (a,a)->aa the
    // word is (aa)(aa), so round 2 must see (aa,aa) with freq 3.
    val words = Map("aaaa" -> 3L, "ab" -> 2L)
    val got = trained(words, 2)
    assert(got == Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)))
  }

  test("tie-break is (freq desc, lhs asc, rhs asc)") {
    // "xy" and "xz" both have freq 5 -> (x,y) wins on rhs.
    val words = Map("xy" -> 5L, "xz" -> 5L)
    assert(trained(words, 1) == Seq((1L, "x", "y", 5L)))
  }

  test("stops early when no pairs remain") {
    val words = Map("a" -> 4L, "b" -> 2L)
    assert(trained(words, 3).isEmpty)
  }

  test("applyMerges encodes with the trained merges, greedily in order") {
    import spark.implicits._
    val sym0 = Seq(("(a)(b)(a)(b)", 1L), ("(b)(a)", 2L))
      .toDF("s", "cnt")
    val out = BpeTrainer.applyMerges(sym0, Seq(("a", "b"), ("ab", "ab")))
      .orderBy("cnt").collect().map(_.getString(0)).toSeq
    assert(out == Seq("(abab)", "(b)(a)"))
  }

  test("matches the naive reference on random corpora") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val words = Vector.fill(30)(
        List.fill(1 + rnd.nextInt(6))("abc"(rnd.nextInt(3))).mkString)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val n = 2 + trial
      assert(trained(words, n) == naive(words, n), s"trial $trial")
    }
  }
}
