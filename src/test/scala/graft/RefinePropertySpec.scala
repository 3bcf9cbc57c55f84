package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantizer

/** [[ProductQuantizer.exactRerank]] over seeded random vectors against
  * a plain-Scala replica. Two properties per trial:
  *
  *   - the refined top-k equals the replica's exact-distance ranking
  *     ID-FOR-ID — the engine's codegen'd in-order DotF fold and the
  *     replica's in-order Scala fold compute the same doubles in the
  *     same order, so the comparison is exact, not tolerant;
  *   - the q96 recall-dominance theorem on the random instance: for
  *     every candidate subset, every exact-top-k member inside the
  *     subset appears in the refined top-k.
  */
class RefinePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Same arithmetic as the engine: norm expansion over in-order
    * double folds of float elements.
    */
  private def sqDist(x: Array[Float], q: Array[Float]): Double = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    dot(x, x) - 2.0 * dot(x, q) + dot(q, q)
  }

  test("exactRerank matches a plain-Scala exact ranking id-for-id on " +
      "seeded random corpora, and the recall theorem holds per instance") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(777 + trial)
      val dim = 8
      val n = 60 + rnd.nextInt(40)
      val vecs = (1L to n.toLong)
        .map(id => id -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      val q = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val raw = vecs.toDF("vec_id", "embedding")
      val query = Seq(Tuple1(q)).toDF("embedding")
      val k = 10
      // a random candidate subset, including some of the true top-k
      // and excluding others (so the theorem bites)
      val candIds = rnd.shuffle(vecs.map(_._1)).take(25 + rnd.nextInt(20))
      val cands = candIds.toDF("vec_id")

      val got = ProductQuantizer.exactRerank(cands, raw,
          "vec_id", "embedding", query, "embedding", k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val byId = vecs.toMap
      val expected = candIds
        .map(id => (id, sqDist(byId(id), q)))
        .sortBy { case (id, d) => (d, id) }.take(k)
      assert(got == expected,
        s"trial $trial: engine $got != replica $expected")

      // theorem: every global exact-top-k member inside the candidate
      // set is in the refined top-k
      val gt = vecs.map { case (id, v) => (id, sqDist(v, q)) }
        .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      val refinedIds = got.map(_._1).toSet
      val survivors = gt.intersect(candIds.toSet)
      assert(survivors.subsetOf(refinedIds),
        s"trial $trial: GT∩C $survivors must all be refined")
    }
  }
}
