package graft.operators

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Completeness of deletion-neighborhood blocking, checked against the
  * brute-force cross join over random vocabularies from a tiny alphabet
  * (small alphabet forces heavy near-collision density, the adversarial
  * case for blocking). Seeded, so failures reproduce.
  */
class FuzzyJoinPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def randomWord(rnd: Random): String =
    List.fill(1 + rnd.nextInt(6))("abc" (rnd.nextInt(3))).mkString

  test("blocking finds exactly the brute-force pair set, k = 1 and 2") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    for (_ <- 1 to 8) {
      val words = List.fill(25)(randomWord(rnd)).distinct
      for (k <- 1 to 2) {
        val brute = (for {
          a <- words; b <- words if a < b
          d = lev(a, b) if d <= k
        } yield (a, b, d.toLong)).toSet
        val blocked = FuzzyJoin.pairsWithin(words.toDS(), k)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .toSet
        assert(blocked == brute,
          s"k=$k vocab=$words missing=${brute -- blocked} " +
            s"spurious=${blocked -- brute}")
      }
    }
  }

  test("deletion variants: counts bounded, always contains the word") {
    val rnd = new Random(42L)
    for (_ <- 1 to 30) {
      val w = randomWord(rnd)
      val v1 = FuzzyJoin.deletionVariants(w, 1)
      val v2 = FuzzyJoin.deletionVariants(w, 2)
      assert(v1.contains(w) && v2.contains(w))
      assert(v1.size <= w.length + 1)
      assert(v2.size <= 1 + w.length + w.length * w.length)
      assert(v1.toSet.subsetOf(v2.toSet))
    }
  }
}
