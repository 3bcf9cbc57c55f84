package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LutSumF

/** Product-quantization invariants on data with known structure, plus
  * the LutSumF kernel's contract against an interpreted HOF reference.
  */
class ProductQuantizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Two well-separated clusters in 16 dims: ids 0..49 near +10 on the
  // first half, ids 50..99 near -10 on the second half. Deterministic
  // jitter from a fixed-seed PRNG.
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    (0 until 100).map { id =>
      val base = Array.fill(16)(0.0f)
      if (id < 50) (0 until 8).foreach(i => base(i) = 10.0f)
      else (8 until 16).foreach(i => base(i) = -10.0f)
      val v = base.map(x => x + rnd.nextFloat() * 0.5f)
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("LutSumF == interpreted element_at fold, bit for bit") {
    val df = Seq(
      (Seq(0L, 2L, 1L), Seq(0.1, 1e30, -0.25)),
      (Seq(3L, 3L, 3L, 3L), Seq(1.5, 2.5, 3.5, -4.5)),
      (Seq.empty[Long], Seq(1.0))).toDF("codes", "lut")
    val hof = aggregate(
      transform($"codes", c => element_at($"lut", (c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
    df.select(LutSumF($"codes", $"lut").as("native"), hof.as("ref"))
      .collect()
      .foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      }
  }

  test("LutSumF: out-of-range or null input degrades to null, not error") {
    val df = Seq(
      (Some(Seq(5L)), Seq(1.0, 2.0)), // out of range
      (Some(Seq(-1L)), Seq(1.0, 2.0)), // negative
      (None, Seq(1.0, 2.0))) // null codes
      .toDF("codes", "lut")
    val got = df.select(LutSumF($"codes", $"lut")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("subvectors partition the vector: sorted reassembly == original") {
    val back = ProductQuantizer.subvectors(clustered, "vec_id", "embedding", 4)
      .groupBy($"vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct($"sub_id", $"sv"))),
        s => s.getField("sv"))).as("re"))
    val joined = clustered.join(back, "vec_id")
      .select(transform($"embedding", _.cast("double")).as("orig"), $"re")
      .collect()
    assert(joined.length == 100)
    joined.foreach(r => assert(r.getSeq[Double](0) == r.getSeq[Double](1)))
  }

  test("train produces dense global codes; encode emits m in-range codes") {
    val books = ProductQuantizer.train(
      clustered, "vec_id", "embedding", m = 4, every = 10, iters = 2)
    val b = books.orderBy($"code").collect()
    assert(b.map(_.getLong(1)).toSeq == b.indices.map(_.toLong)) // dense 0..n-1
    assert(b.forall(_.getSeq[Double](2).length == 4)) // d/m dims
    assert(b.map(_.getInt(0)).distinct.sorted.toSeq == Seq(0, 1, 2, 3))

    val codes = ProductQuantizer.encode(clustered, "vec_id", "embedding", 4, books)
    val c = codes.collect()
    assert(c.length == 100)
    val n = b.length
    assert(c.forall(_.getSeq[Long](1).length == 4))
    assert(c.forall(_.getSeq[Long](1).forall(x => x >= 0 && x < n)))
  }

  test("kernel encode == join+window reference, synthetic + real corpus") {
    // r17: encode became a map-only PqEncodeF over plan-constant
    // codebooks; the retained join+window formulation is the
    // reference. Row-for-row code-array equality on (a) the synthetic
    // clusters, (b) real sf0.01 float embeddings, both with trained
    // books.
    def parity(df: org.apache.spark.sql.DataFrame, m: Int, every: Int): Unit = {
      val books = ProductQuantizer.train(df, "vec_id", "embedding", m, every, 2)
      def canon(out: org.apache.spark.sql.DataFrame) =
        out.orderBy("vec_id").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1)))
      val got = canon(ProductQuantizer.encode(df, "vec_id", "embedding", m, books))
      val want = canon(ProductQuantizer.encodeViaJoin(df, "vec_id", "embedding", m, books))
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g == w) }
    }
    parity(clustered, 4, 10)
    parity(graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings"), 8, 20)
  }

  test("ADC top-k on separated clusters returns the query's cluster") {
    val books = ProductQuantizer.train(
      clustered, "vec_id", "embedding", m = 4, every = 10, iters = 2)
    val codes = ProductQuantizer.encode(clustered, "vec_id", "embedding", 4, books)
    // query: a fresh point inside cluster A (ids < 50)
    val q = Seq(Tuple1((0 until 16).map(i => if (i < 8) 10.2f else 0.1f)))
      .toDF("embedding")
    val lut = ProductQuantizer.lutFor(q, "embedding", 4, books)
    assert(lut.length == books.count())
    val top = ProductQuantizer.adcTopK(codes, "vec_id", lut, 10).collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(0) < 50), "all neighbors from cluster A")
    val dists = top.map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }, "ascending")
  }

  test("IVF-PQ: residual index finds the query's cluster; LUT join == kernel") {
    val coarse = KMeans.fit(clustered, "vec_id", "embedding",
      KMeans.initEvery(clustered, "vec_id", "embedding", 25), iters = 2)
    val (codes, books) = ProductQuantizer.ivfPqEncode(
      clustered, "vec_id", "embedding", m = 4, coarse, every = 10, iters = 2)
    assert(codes.count() == 100)

    val q = Seq(Tuple1((0 until 16).map(i => if (i < 8) 9.8f else 0.2f)))
      .toDF("embedding")
    val top = ProductQuantizer.ivfPqTopK(
      q, "embedding", 4, coarse, books, codes, "vec_id", nProbe = 2, k = 10)
      .collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(0) < 50), "all neighbors from cluster A")
    val dists = top.map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }, "ascending")

    // independent re-scoring: explode the survivors' codes and sum the
    // matching LUT rows — must agree with the LutSumF fold up to
    // float reassociation
    val probes = {
      import org.apache.spark.sql.expressions.Window
      val l2 = graft.functions.VectorFns.normSq($"cv") -
        lit(2.0) * graft.functions.VectorFns.dot($"cv", $"qv") +
        graft.functions.VectorFns.normSq($"qv")
      coarse.crossJoin(q.select($"embedding".as("qv")))
        .withColumn("qd", l2)
        .withColumn("rn", row_number().over(
          Window.orderBy($"qd".asc, $"cell_id")))
        .filter($"rn" <= 2)
        .select($"cell_id",
          zip_with($"qv", $"cv", (x, c) => x.cast("double") - c).as("qr"))
    }
    val lutRows = ProductQuantizer.ivfPqLutRows(probes, 4, books)
    val topDf = ProductQuantizer.ivfPqTopK(
      q, "embedding", 4, coarse, books, codes, "vec_id", nProbe = 2, k = 10)
    val survivors = codes.join(topDf.select($"vec_id", $"adc_dist"), "vec_id")
    val joined = survivors
      .select($"vec_id", $"cell_id", $"adc_dist", explode($"codes").as("code"))
      .join(lutRows, Seq("cell_id", "code"))
      .groupBy($"vec_id", $"adc_dist")
      .agg(sum($"d").as("join_dist"))
      .collect()
    assert(joined.length == 10)
    joined.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9))
  }

  test("incremental IVF-PQ: frozen-model append serves the merged index (q68 shape)") {
    import graft.operators.KMeans
    val base = clustered.filter(pmod($"vec_id", lit(10)) =!= 9)
    val batch = clustered.filter(pmod($"vec_id", lit(10)) === 9)
    val dir = java.nio.file.Files.createTempDirectory("pqinc").toString
    // build: persist models first, then encode base with the READ-BACK
    // frozen floats — the self-consistency order q68 uses
    val trained = KMeans.fit(base, "vec_id", "embedding",
      KMeans.initEvery(base, "vec_id", "embedding", 25), iters = 2)
    spark.createDataFrame(
        java.util.Arrays.asList(trained.collect(): _*), trained.schema)
      .write.mode("overwrite").parquet(s"$dir/coarse")
    val coarse0 = spark.read.parquet(s"$dir/coarse")
    ProductQuantizer.ivfPqTrainBooks(
        base, "vec_id", "embedding", 4, coarse0, every = 25, iters = 2)
      .write.mode("overwrite").parquet(s"$dir/books")
    val coarseF = spark.read.parquet(s"$dir/coarse")
    val booksF = spark.read.parquet(s"$dir/books")
    ProductQuantizer.ivfPqEncodeWith(base, "vec_id", "embedding", 4, coarseF, booksF)
      .write.mode("overwrite").parquet(s"$dir/codes/gen=0")
    // append: frozen cells + frozen codebooks, O(batch)
    ProductQuantizer.ivfPqEncodeWith(batch, "vec_id", "embedding", 4, coarseF, booksF)
      .write.mode("overwrite").parquet(s"$dir/codes/gen=1")
    val stored = spark.read.parquet(s"$dir/codes")
      .select($"cell_id", $"vec_id", $"codes")
    assert(stored.count() == 100, "merged index must cover base + batch")
    // re-deriving the batch codes from the frozen models is exact —
    // the persistence-roundtrip/determinism contract
    val re = ProductQuantizer.ivfPqEncodeWith(
      batch, "vec_id", "embedding", 4, coarseF, booksF)
    val mismatched = spark.read.parquet(s"$dir/codes/gen=1")
      .select($"vec_id", $"cell_id".as("c1"), $"codes".as("k1"))
      .join(re.select($"vec_id", $"cell_id".as("c2"), $"codes".as("k2")),
        Seq("vec_id"), "full")
      .filter($"c1".isNull || $"c2".isNull || $"c1" =!= $"c2" || $"k1" =!= $"k2")
    assert(mismatched.count() == 0, "frozen re-encode must match the stored generation")
    // serving the merged index: a query at cluster A's center must
    // retrieve only cluster-A ids, and at k=50 ALL of cluster A —
    // including every appended batch member (the index is not stale)
    val q = Seq(Tuple1((0 until 16).map(i => if (i < 8) 10.0f else 0.0f)))
      .toDF("embedding")
    val ids = ProductQuantizer.ivfPqTopK(
        q, "embedding", 4, coarseF, booksF, stored, "vec_id", nProbe = 2, k = 50)
      .select($"vec_id").as[Long].collect().toSet
    assert(ids.forall(_ < 50), s"cluster-A query retrieved cluster-B ids: ${ids.filter(_ >= 50)}")
    assert(Set(9L, 19L, 29L, 39L, 49L).subsetOf(ids),
      s"appended batch vectors missing from serving: ${Set(9L, 19L, 29L, 39L, 49L) -- ids}")
  }
}
