package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** On data with real cluster structure, two Lloyd's iterations from a
  * one-point-per-cluster init must reach purity 1 (every cluster's points
  * in one cell), keep dimensionality, and cover every vector exactly once.
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 3 tight clusters of 30 points in 8-dim: cluster c centered on axes
    * (c, c+3), deterministic small jitter from the point index.
    */
  private def clustered = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      p <- 0 until 30
    } yield {
      val v = Array.tabulate(8) { d =>
        val base = if (d == c || d == c + 3) 1.0 else 0.0
        base + 0.01 * (((p * 31 + d * 7) % 11) - 5)
      }
      (c * 30 + p + 1L, c, v)
    }
    rows.toDF("id", "cluster", "vec")
  }

  test("k-means reaches purity 1 on separable clusters") {
    val df = clustered
    // init: the first point of each cluster (ids 1, 31, 61 = 1 mod 30)
    val init = KMeans.initEvery(df, "id", "vec", 30)
    assert(init.count() == 3)
    val cents = KMeans.fit(df, "id", "vec", init, iters = 2)
    val assigned = KMeans.assign(df, "id", "vec", cents)
      .join(df.select(col("id"), col("cluster")), "id")
    val purity = assigned.groupBy(col("cluster"))
      .agg(countDistinct(col("cell_id")).as("cells"))
      .collect()
    assert(purity.forall(_.getLong(1) == 1), purity.mkString(","))
    assert(assigned.select(col("cell_id")).distinct().count() == 3)
    assert(assigned.count() == 90)
    val c = cents.collect()
    assert(c.forall(_.getSeq[Double](1).length == 8))
  }

  test("kernel assign == crossJoin+window reference, synthetic + real corpus") {
    // r17: assign became a map-only NearestCellF argmax; the retained
    // window formulation is the reference. Row-for-row equality (same
    // id -> same cell) on (a) the synthetic clusters with trained
    // centroids, (b) real sf0.01 float embeddings with ivf-style
    // trained centroids.
    def parity(df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
        cents: org.apache.spark.sql.DataFrame): Unit = {
      val got = KMeans.assign(df, idCol, vecCol, cents)
        .select(col(idCol), col("cell_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val want = KMeans.assignViaWindow(df, idCol, vecCol, cents)
        .select(col(idCol), col("cell_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g == w) }
    }
    val df = clustered
    parity(df, "id", "vec",
      KMeans.fit(df, "id", "vec", KMeans.initEvery(df, "id", "vec", 30), 2))
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val init = KMeans.initEvery(emb, "vec_id", "embedding", 40)
    parity(emb, "vec_id", "embedding",
      KMeans.fit(emb, "vec_id", "embedding", init, 2))
  }

  test("null / null-element data vectors: kernel emits NULL cell_id " +
      "(documented divergence from the window form's lowest-cell pick)") {
    // r17 ADVICE: pin the intended semantics instead of leaving them
    // accidental. The window form ranks all-null sims nulls-last and
    // ties to the LOWEST cell_id; the kernel refuses to assign (NULL),
    // which is the serving behavior we WANT for a vectorless row.
    import spark.implicits._
    val df = Seq(
      (1L, Array[java.lang.Double](1.0, 0.0)),
      (2L, null.asInstanceOf[Array[java.lang.Double]]),
      (3L, Array[java.lang.Double](0.5, null)))
      .toDF("id", "vec")
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("cell_id", "cv")
    val kernel = KMeans.assign(df, "id", "vec", cents)
      .select(col("id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(kernel(1L) === Some(0L))
    assert(kernel(2L) === None, "null vector must yield NULL cell_id")
    assert(kernel(3L) === None, "null element must yield NULL cell_id")
    val window = KMeans.assignViaWindow(df, "id", "vec", cents)
      .select(col("id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(window(1L) === 0L)
    // the window form's documented (different) degenerate pick
    assert(window(2L) === 0L)
    assert(window(3L) === 0L)
  }

  test("empty cells drop out instead of producing NaN centroids") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(1.0, 0.1)))
      .toDF("id", "vec")
    // far-away init point 2 captures nothing after the first assignment
    val init = Seq((100L, Array(1.0, 0.05)), (200L, Array(-1.0, -1.0)))
      .toDF("cell_id", "cv")
    val cents = KMeans.fit(df, "id", "vec", init, iters = 2).collect()
    assert(cents.length == 1, cents.mkString(","))
    assert(!cents.exists(_.getSeq[Double](1).exists(_.isNaN)))
  }
}
