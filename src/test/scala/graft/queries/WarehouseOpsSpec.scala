package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Structural invariants of the warehouse-shape queries (SCD2 history,
  * embedding dedup clusters) that the value-hash oracle can't express.
  */
class WarehouseOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scd2 history: contiguous intervals, one current row per user, real changes") {
    val rows = SparkEntry.queries("q33_scd2")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, hist0) =>
      val hist = hist0.sortBy(_._3.getTime)
      // exactly one open (is_current) row, and it is the last
      assert(hist.count(_._5) == 1, s"user $user: current-row count != 1")
      assert(hist.last._5, s"user $user: current row is not the latest")
      hist.foreach { case (_, _, from, to, _) =>
        assert(from.getTime < to.getTime, s"user $user: empty/negative interval")
      }
      hist.sliding(2).foreach {
        case Array((_, t1, _, to1, _), (_, t2, from2, _, _)) =>
          assert(to1 == from2, s"user $user: gap between versions")
          assert(t1 != t2, s"user $user: consecutive versions share type $t1")
        case _ =>
      }
    }
  }

  test("embed dedup clusters are consistent with the cosine pair graph") {
    val pairs = SparkEntry.queries("q24_cosine_pairs")(spark, sf)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q24_embed_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nVecs = graft.Tables.load(spark, sf, "embeddings").count()
    assert(clusters.size.toLong == nVecs, "every vector gets a cluster id")
    assert(clusters.forall { case (v, c) => c <= v }, "cluster id is a component min")
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.collect { case (v, c) if !paired.contains(v) =>
      assert(c == v, s"isolated vector $v moved to cluster $c")
    }
  }
}
