package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct behavior tests for the custom Catalyst expressions (codegen +
  * eval parity, null/empty handling, structural properties).
  */
class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("rolling hash: known small values and null passthrough") {
    val df = Seq(Some(""), Some("a"), Some("ab"), None).toDF("s")
      .select(RollingHash64.rolling_hash64(col("s")).as("h"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0) == Some(0L))
    assert(got(1) == Some(97L))            // 'a'
    assert(got(2) == Some(97L * 31 + 98))  // 'a'*31 + 'b'
    assert(got(3) == None)
  }

  test("simhash: empty tokens -> 0, identical arrays -> identical hashes") {
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("x", "y", "z")),
      (3L, Seq("x", "y", "z"))).toDF("id", "toks")
      .select(col("id"), SimHash64.simhash64(col("toks")).as("h"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 0L)
    assert(m(2L) == m(3L))
  }

  test("simhash: near-identical token lists land within small Hamming distance") {
    val base = (1 to 200).map(i => s"tok$i")
    val mutated = base.updated(7, "CHANGED").updated(100, "ALSO")
    val df = Seq((1L, base), (2L, mutated)).toDF("id", "toks")
      .select(col("id"), SimHash64.simhash64(col("toks")).as("h"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hamming = java.lang.Long.bitCount(m(1L) ^ m(2L))
    assert(hamming <= 12, s"hamming=$hamming")
  }

  test("minhash signature: lanes, determinism, and containment monotonicity") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = a ++ Seq("extra1", "extra2")        // superset: mins can only drop
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "sh")
      .select(col("id"), MinHashSignature.minhash_signature(col("sh"), 16).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L).length == 16)
    assert(m(1L) == m(2L))
    m(1L).zip(m(3L)).foreach { case (x, y) => assert(y <= x) }
  }

  test("composed HOF MinHash (reference implementation) keeps MinHash properties") {
    // MinHashFns is the readable built-in composition the native
    // expression replaced; keep its behavior pinned
    val a = (1 to 60).map(i => s"sh$i")
    val df = Seq((1L, a), (2L, a)).toDF("id", "sh")
      .select(col("id"), MinHashFns.signature(col("sh"), 8).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L).length == 8 && m(1L) == m(2L))
  }

  test("band keys derive from signature slices consistently") {
    val sh = (1 to 50).map(i => s"s$i")
    val df = Seq(Tuple1(sh)).toDF("sh").select(
      MinHashSignature.minhash_signature(col("sh"), 16).as("sig"),
      MinHashSignature.minhash_band_keys(col("sh"), 4, 4).as("bk"))
    val r = df.collect().head
    val sig = r.getSeq[Long](0).toArray
    val bk = r.getSeq[Long](1)
    assert(bk == MinHashSignature.bandKeys(sig, 4, 4).toSeq)
  }

  test("WordNgrams equals the composed TextFns.ngrams it replaces") {
    // the excision/repetition queries swapped the interpreted HOF for
    // the codegen'd expression — element-for-element parity (including
    // multiplicity and posexplode positions) is the swap's contract
    val docs = Seq(
      "a b c d e", "a a a a", "one", "", " ", "x  y z", // double space
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "a b").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 8)) {
      val composed = docs.select(col("id"), TextFns.ngrams(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val native = docs.select(col("id"), WordNgrams.word_ngrams(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == composed, s"n=$n")
    }
  }
}
