package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vector kernels must be BIT-identical to the interpreted
  * HOF folds they replaced — the oracle hash-compares depend on it.
  * The HOF formulations are reproduced here verbatim as the reference.
  */
class VectorKernelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def hofSignBits(v: org.apache.spark.sql.Column, nBits: Int) = {
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast("double") *
            (when(pmod(xxhash64(i.cast("long") + lit(j.toLong << 16)), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0)))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  // adversarial floats: denormals, huge/tiny magnitude mixes where fold
  // order visibly changes the double result, negatives, exact halves
  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(1.0f, 2.0f, 3.0f),
    Seq(1e30f, 1.0f, -1e30f, 1.0f),
    Seq(1.4e-45f, 3.4e38f, -3.4e38f, 1.1754944e-38f),
    Seq(0.1f, 0.2f, 0.3f, 0.4f, 0.5f, 0.6f, 0.7f, 0.8f),
    (1 to 64).map(i => (math.sin(i) * 100).toFloat),
    Seq(-0.0f, 0.0f, 0.5f))

  test("DotF == interpreted aggregate(zip_with) fold, bit for bit") {
    val df = vecs.map(v => (v, v.reverse)).toDF("a", "b")
    val got = df.select(
      VectorFns.dot($"a", $"b").as("native"), hofDot($"a", $"b").as("hof"),
      VectorFns.normSq($"a").as("native_n"), hofDot($"a", $"a").as("hof_n"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("SignBitsLsh == interpreted per-bit projection signs") {
    val df = vecs.toDF("v")
    for (nBits <- Seq(1, 17, 48, 64)) {
      val got = df.select(VectorFns.signBits($"v", nBits).as("native"),
        hofSignBits($"v", nBits).as("hof")).collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"nBits=$nBits"))
    }
  }

  test("null/ragged semantics match zip_with+aggregate") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)) // ragged
    ).toDF("a", "b")
    val r = df.select(VectorFns.dot($"a", $"b").as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("double-element arrays are supported (centroid side)") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(0.5, 0.25))).toDF("a", "c")
    val r = df.select(VectorFns.dot($"a", $"c").as("d")).collect().head
    assert(r.getDouble(0) == 1.0)
  }

  test("LutBuildF == the DotF-composed slice formulation, bit for bit " +
      "(the batch-serve LUT kernel, r16)") {
    // a codebook over m=4 subspaces of length 2, ksub=3 each, with the
    // adversarial magnitudes above folded into both sides
    val m = 4
    val subLen = 2
    val qrs: Seq[Seq[Double]] = Seq(
      (1 to 8).map(_.toDouble),
      Seq(1e30, 1.0, -1e30, 1.0, 0.1, 0.2, -0.0, 0.5),
      (1 to 8).map(i => math.sin(i) * 100))
    val cvs: Seq[(Int, Seq[Double])] = (0 until m).flatMap(s =>
      (0 until 3).map(c =>
        s -> Seq(math.cos(s * 3 + c) * 10, (s * 3 + c).toDouble / 7)))
    val subLit = typedLit(cvs.map(_._1))
    val cvLit = typedLit(cvs.map(_._2))
    val df = qrs.map(Tuple1(_)).toDF("qr")
    val native = df.select(
      LutBuildF($"qr", subLit, cvLit).as("lut")).collect()
      .map(_.getSeq[Double](0))
    // reference: per-code slice + the DotF combine the join path used
    val refCols = cvs.zipWithIndex.map { case ((s, cv), i) =>
      val qsv = slice($"qr", s * subLen + 1, subLen)
      (VectorFns.normSq(qsv) - lit(2.0) * VectorFns.dot(qsv, typedLit(cv)) +
        VectorFns.normSq(typedLit(cv))).as(s"d$i")
    }
    val ref = df.select(refCols: _*).collect()
      .map(r => (0 until cvs.length).map(r.getDouble))
    native.zip(ref).foreach { case (n, e) =>
      assert(n.length == e.length)
      n.zip(e).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y))
      }
    }
  }

  test("LutBuildF null semantics: out-of-range slice and ragged " +
      "codebook yield null") {
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("qr")
    // sub id 3 over subLen 2 needs 8 elements; qr has 2 → null
    val r = df.select(LutBuildF($"qr", typedLit(Seq(3)),
      typedLit(Seq(Seq(0.5, 0.25)))).as("lut")).collect().head
    assert(r.isNullAt(0))
    val r2 = df.select(LutBuildF($"qr", typedLit(Seq(0, 0)),
      typedLit(Seq(Seq(0.5, 0.25)))).as("lut")).collect().head
    assert(r2.isNullAt(0), "sub/cv length mismatch must be null")
  }
}
