package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Structural invariants of the round-4 insight queries beyond the
  * value-hash oracle: funnel monotonicity, completeness of the
  * deletion-neighborhood blocking, PageRank mass conservation, and
  * phrase-search equivalence with a brute-force scan.
  */
class InsightsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("funnel stages are monotonically non-increasing") {
    val r = SparkEntry.queries("q35_funnel")(spark, sf).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0, "no users entered the funnel")
  }

  test("edit join: deletion-neighborhood blocking finds every pair a " +
      "brute-force cross join finds") {
    import org.apache.spark.sql.functions._
    val blocked = SparkEntry.queries("q35_edit_join")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val words = graft.Tables.load(spark, sf, "part")
      .select(explode(split(col("p_name"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- words; b <- words if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(blocked == brute,
      s"blocking missed ${(brute -- blocked).size} pairs, " +
        s"invented ${(blocked -- brute).size}")
    assert(brute.nonEmpty, "vacuous test: no pairs within distance 2")
  }

  test("quality suite: statuses and metrics agree with direct recounts") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q37_quality_suite")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rows.size == 6)
    // the generated lineitem is NOT key-clean: (l_orderkey, l_linenumber)
    // has genuine duplicates, which the suite must surface, not hide
    val l = graft.Tables.load(spark, sf, "lineitem")
    val dups = l.count() -
      l.select("l_orderkey", "l_linenumber").distinct().count()
    assert(dups > 0, "fixture changed: key is now unique; update this spec")
    assert(rows("orderkey_linenumber_unique") == ((dups.toDouble, false)))
    assert(rows("shipdate_completeness") == ((1.0, true)))
    assert(rows("orders_custkey_fk")._2 && rows("quantity_range")._2 &&
      rows("returnflag_domain")._2 && rows("lineitem_rowcount")._2)
  }

  test("pagerank: positive ranks, total mass matches the damping identity") {
    val pr = SparkEntry.queries("q38_pagerank")(spark, sf)
      .collect().map(_.getDouble(1))
    assert(pr.length == 25)
    assert(pr.forall(_ >= 0.15 / 25 - 1e-9), "rank below teleport floor")
    // every nation trades, so no dangling mass: total stays 1.0
    assert(math.abs(pr.sum - 1.0) < 1e-3, s"mass drifted: ${pr.sum}")
  }

  test("lm score: one bigram per adjacent pair, log-probs strictly negative") {
    import org.apache.spark.sql.functions._
    val scores = SparkEntry.queries("q36_lm_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val nTok = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(scores.nonEmpty)
    scores.foreach { case (doc, score, nBigrams) =>
      assert(nBigrams == nTok(doc) - 1L,
        s"doc $doc: $nBigrams bigrams from ${nTok(doc)} tokens")
      // add-one smoothing bounds P strictly inside (0, 1)
      assert(score < 0.0, s"doc $doc: non-negative log-prob $score")
    }
  }

  test("session attribution covers every purchase exactly once") {
    import org.apache.spark.sql.functions._
    val attributed = SparkEntry.queries("q34_session_attribution")(spark, sf)
      .agg(sum("n_purchases")).collect().head.getLong(0)
    val purchases = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(attributed == purchases,
      s"attributed $attributed of $purchases purchases")
    assert(purchases > 0, "vacuous test: no purchase events")
  }

  test("phrase search equals brute-force token-window scan") {
    import org.apache.spark.sql.functions._
    val indexed = SparkEntry.queries("q41_phrase_search")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect().map { r =>
        val toks = r.getSeq[String](1)
        r.getLong(0) -> toks.sliding(2).count(s =>
          s.length == 2 && s.head == "table" && s(1) == "value").toLong
      }.filter(_._2 > 0).toMap
    assert(indexed == brute)
    assert(brute.nonEmpty, "vacuous test: phrase absent from corpus")
  }
}
