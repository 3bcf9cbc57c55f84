package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the q48 sampling family, independent of the
  * DuckDB oracles.
  */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // The load-bearing arithmetic claim: the front-loaded integer bucket
  // formula reproduces SQL ntile exactly — including the remainder
  // placement the folklore `(pos-1)*k div n` form gets wrong (n=7, k=5
  // is a counter-example for that one).
  test("ntileExpr matches Spark's ntile for awkward (n, k) pairs") {
    import spark.implicits._
    for {
      n <- Seq(1, 2, 5, 7, 9, 10, 11, 23, 100)
      k <- Seq(1, 2, 3, 5, 7, 10) if k <= n
    } {
      val d = (1 to n).map(_.toLong).toDF("id")
      val expected = d
        .withColumn("bin", ntile(k).over(Window.orderBy("id")))
        .select(col("id"), col("bin").cast("long"))
      val got = d
        .withColumn("pos", col("id"))
        .withColumn("n", lit(n.toLong))
        .select(col("id"), expr(Sampling.ntileExpr(k)).cast("long").as("bin"))
      val diff = got.except(expected).union(expected.except(got))
      assert(diff.isEmpty, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("the folklore bucket formula is NOT ntile (guard the comment)") {
    // n=7, k=5: ntile sizes are 2,2,1,1,1; (pos-1)*k div n gives
    // 2,1,2,1,1. If this ever starts passing, the scaladoc claim in
    // Sampling is stale.
    val folklore = (1 to 7).map(p => (p - 1) * 5 / 7 + 1)
    assert(folklore.groupBy(identity).view.mapValues(_.size).toMap !=
      Map(1 -> 2, 2 -> 2, 3 -> 1, 4 -> 1, 5 -> 1))
  }

  test("priority sample is deterministic and weight-monotone in expectation") {
    import spark.implicits._
    val d = (1L to 400L).map(i => (i, if (i <= 200) 10L else 1000L))
      .toDF("doc_id", "n_chars")
    def sample() = {
      val u16 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
      d.select(col("doc_id"), col("n_chars"),
          ((col("n_chars") * lit(65536L)).cast("double") /
            (u16 + lit(1L)).cast("double")).as("priority"))
        .orderBy(col("priority").desc, col("doc_id").asc)
        .limit(40).collect().map(_.getLong(0)).toSeq
    }
    val a = sample()
    assert(a == sample()) // bit-stable across runs
    // heavy docs (100× weight) should dominate a weighted sample
    assert(a.count(_ > 200) >= 35, s"heavy-doc share too low: $a")
  }

  test("sq8 codes stay in [0,255] and recover exact argmax structure") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), // query
      (1L, Array(1.0f, 0.1f, 0.0f)), // near-duplicate of query
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val ex = vecs
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("v"))
    val st = ex.groupBy("i").agg(min("v").as("mn"), max("v").as("mx"))
    val codes = ex.join(broadcast(st), "i")
      .select(col("vec_id"), col("i"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(greatest(lit(0L), least(lit(255L),
            floor((col("v") - col("mn")) * lit(255.0) /
              (col("mx") - col("mn"))).cast("long"))))
          .as("code"))
    val all = codes.collect()
    assert(all.forall { r =>
      val c = r.getAs[Long]("code"); c >= 0L && c <= 255L
    })
    val q = codes.filter(col("vec_id") === 0)
      .select(col("i"), col("code").as("qcode"))
    val top = codes.filter(col("vec_id") =!= 0)
      .join(broadcast(q), "i")
      .groupBy("vec_id")
      .agg(sum(col("code") * col("qcode")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .collect()
    assert(top.head.getLong(0) == 1L) // the near-duplicate wins
  }

  test("jlCosinePairs: duplicates project to cosine 1.0, deterministic") {
    import spark.implicits._
    // 16-dim vectors: 0 and 1 identical (→ identical codes → identical
    // reduced vectors → cosine exactly 1.0); 2 is a distinct pattern.
    val base = (0 until 16).map(i => if (i % 2 == 0) 1.0f else -0.5f)
    val other = (0 until 16).map(i => if (i % 3 == 0) -1.0f else 0.8f)
    val vecs = Seq(
      (0L, base), (1L, base), (2L, other)).toDF("vec_id", "embedding")
    def run() = Sampling.jlCosinePairs(vecs, 8)
      .orderBy("vec_a", "vec_b").collect()
    val rows = run()
    val byPair = rows.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cosine_red")).toMap
    assert(byPair((0L, 1L)) == 1.0) // exact: integer vectors are equal
    assert(byPair((0L, 2L)) < 1.0)  // distinct pattern does not saturate
    assert(byPair((0L, 2L)) == byPair((1L, 2L))) // same projection
    // data-independent md5 sign matrix → bit-identical reruns
    assert(rows.toSeq == run().toSeq)
  }

  test("jlCosinePairs equals a straight-line model on random vectors") {
    // Pins the whole arithmetic chain — per-dim min/max, centered SQ8
    // codes, md5 sign matrix, integer projection, round-6 cosine —
    // against an in-memory replica on seeded random float vectors.
    import java.security.MessageDigest
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val dims = 6
    val k = 4
    val n = 5
    val vecs = (0 until n).map(id =>
      (id.toLong, Seq.fill(dims)(rnd.nextFloat() * 2f - 1f)))
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val v = vecs.map { case (id, xs) => id -> xs.map(_.toDouble) }.toMap
    val mn = (0 until dims).map(i => vecs.map(_._2(i).toDouble).min)
    val mx = (0 until dims).map(i => vecs.map(_._2(i).toDouble).max)
    def code(id: Long, i: Int): Long =
      (if (mx(i) == mn(i)) 0L
       else math.max(0L, math.min(255L,
         math.floor((v(id)(i) - mn(i)) * 255.0 / (mx(i) - mn(i))).toLong))) - 128L
    def sgn(j: Int, i: Int): Long =
      if ("01234567".contains(md5hex(s"${j}_${i + 1}").charAt(0))) 1L else -1L
    def red(id: Long): Seq[Long] =
      (0 until k).map(j => (0 until dims).map(i => code(id, i) * sgn(j, i)).sum)
    val expect = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      ra = red(a); rb = red(b)
      na = ra.map(x => x * x).sum; nb = rb.map(x => x * x).sum
      if na > 0 && nb > 0
    } yield {
      val dot = ra.zip(rb).map { case (x, y) => x * y }.sum
      val cos = BigDecimal(dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, dot, cos)
    }).toSet
    val got = Sampling.jlCosinePairs(vecs.toDF("vec_id", "embedding"), k)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Long]("dot_red"), r.getAs[Double]("cosine_red"))).toSet
    assert(got == expect)
  }

  test("balancedShards: round-robin doc counts, mass beats contiguous chunks") {
    import spark.implicits._
    // Heavily skewed sizes: doc i has i tokens (1..400). Round-robin
    // over the size-DESC order must (a) give every shard exactly
    // n/shards docs, (b) spread token mass far tighter than contiguous
    // range chunks of the same order would.
    val docs = (1 to 400)
      .map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Sampling.balancedShards(docs, 8, 4).collect()
    assert(r.length == 8)
    assert(r.forall(_.getAs[Long]("n_docs") == 50L))
    val masses = r.map(_.getAs[Long]("tok_mass"))
    val rrSpread = masses.max - masses.min
    // contiguous chunks of the same DESC order: chunk 0 gets sizes
    // 400..351, chunk 7 gets 50..1
    val desc = (1 to 400).map(_.toLong).sorted(Ordering[Long].reverse)
    val chunkMasses = desc.grouped(50).map(_.sum).toSeq
    val chunkSpread = chunkMasses.max - chunkMasses.min
    assert(rrSpread * 10 < chunkSpread,
      s"round-robin spread $rrSpread not « chunk spread $chunkSpread")
    assert(masses.sum == (1 to 400).map(_.toLong).sum) // conservation
  }

  test("balancedShards: fewer docs than shards yields singleton shards") {
    import spark.implicits._
    val docs = (1 to 3).map(i => (i.toLong, "w w w")).toDF("doc_id", "text")
    val r = Sampling.balancedShards(docs, 8, 4).collect()
    assert(r.length == 3) // only shards 0..2 materialize
    assert(r.forall(_.getAs[Long]("n_docs") == 1L))
  }
}
