package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Invariants of the q53 cross-document-overlap family: the
  * containment-dominates-Jaccard subset relation, the asymmetric catch a
  * symmetric measure misses (a short doc quoted inside a long one), and
  * the novelty conservation law (every distinct shingle is novel exactly
  * once).
  */
class OverlapSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("containment pairs dominate high-Jaccard pairs (C >= J)") {
    val cont = SparkEntry.queries("q53_containment_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = SparkEntry.queries("q23_jaccard_pairs")(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.subsetOf(cont),
      s"J>=0.9 pairs missing from containment: ${jac -- cont}")
    cont.foreach { case (a, b) => assert(a < b, s"pair not ordered: ($a, $b)") }
  }

  test("containment catches a strict-subset doc that Jaccard misses") {
    import spark.implicits._
    val dir = graft.RunPaths.scratch("graft_overlap_fixture")
    val short = (1 to 10).map(i => s"tok$i").mkString(" ")
    val long = ((1 to 10) ++ (11 to 100)).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, short, "en", "quote", short.length.toLong),
      (2L, long, "en", "article", long.length.toLong),
      (3L, (200 to 260).map(i => s"ztok$i").mkString(" "), "en", "other", 61L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q53_containment_pairs")(spark, dir).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0, s"short-in-long containment != 1: $r")
    assert(r.getDouble(3) < 0.1, s"reverse containment suspiciously high: $r")
    // the symmetric measure misses it entirely
    val jac = SparkEntry.queries("q23_jaccard_pairs")(spark, dir).collect()
    assert(!jac.exists(p => p.getLong(0) == 1L && p.getLong(1) == 2L),
      "Jaccard>=0.8 unexpectedly caught the subset pair — fixture too similar")
  }

  test("novelty conserves: sum of novel postings = distinct corpus shingles") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q53_ngram_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"n_novel > n_grams: $r")
      val nov = r.getDouble(4)
      assert(nov > 0.0 && nov <= 1.0, s"novelty outside (0,1]: $r")
    }
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.WordShingles
        .word_shingles(col("text"), 3)).as("g"))
    val distinctShingles = docs.select(countDistinct(col("g"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == distinctShingles,
      "each distinct shingle must be counted novel exactly once")
  }
}
