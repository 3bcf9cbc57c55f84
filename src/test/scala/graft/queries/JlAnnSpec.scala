package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q59_jl_ann contracts: the JL → sign-LSH composition must (a) recall
  * most of the EXACT reduced-space top-k (the claim "project first, then
  * bucket" is only proven if bucketing the reduced space finds the same
  * neighbors exact reduced-space scoring finds), (b) stay deterministic,
  * and (c) the declared-small-scale exact forms must REFUSE oversized
  * inputs instead of silently enumerating ~n²/2 pairs.
  */
class JlAnnSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def reduced() = Sampling.jlReducedIndex(
    graft.Tables.load(spark, sf, "embeddings"), 16)

  test("JL-ANN recall@10 against exact reduced-space ranking") {
    val red = reduced()
    val ann = Sampling.jlAnnTopK(red, 10)
      .collect().map(_.getLong(0)).toSet
    val q = red.filter(col("vec_id") === 0)
      .select(col("rv").as("qv"), col("n2").as("qn2"))
    val exact = red.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.VectorFns.dot(col("rv"), col("qv")) /
          (sqrt(col("n2")) * sqrt(col("qn2"))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    info(s"recall@10 = $recall (ann=${ann.size} exact=${exact.size})")
    assert(exact.size == 10)
    assert(recall >= 0.6,
      s"JL-ANN recall@10 $recall below the q59 contract threshold 0.6")
  }

  test("sf0.01 recall@10 >= 0.9; a crippled probe budget is caught") {
    // The query's oracle floor is recall_ok = recall >= 0.6, which an
    // LSH regression that halves recall could hide under; this pins the
    // real operating point at the verification SF.
    val red = Sampling.jlReducedIndex(
      graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings"), 16)
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.collect().map(_.getLong(0)).toSet
      val q = red.filter(col("vec_id") === 0)
        .select(col("rv").as("qv"), col("n2").as("qn2")).limit(1)
      val exact = red.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.functions.VectorFns.dot(col("rv"), col("qv")) /
            (sqrt(col("n2")) * sqrt(col("qn2"))), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val shipped = recallOf(Sampling.jlAnnTopK(red, 10))
    info(s"shipped recall@10 at sf0.01 = $shipped")
    assert(shipped >= 0.9,
      s"JL-ANN recall@10 $shipped at sf0.01 below 0.9 — probe budget regressed")
    // negative control: one table, 12-bit keys (≈0.1 vectors/bucket,
    // 13 probes) must fall below the assertion's bar — proving the 0.9
    // floor has teeth against a broken probe count
    val crippled = recallOf(LlmOps.signLshTopK(
      red.select("vec_id", "rv"), "rv", 10, nTables = 1, bits = 12))
    info(s"crippled recall@10 at sf0.01 = $crippled")
    assert(crippled < 0.9,
      s"negative control failed: crippled probe budget still recalls $crippled")
  }

  test("q59_jl_ann emits its contract row and is deterministic") {
    val run1 = graft.SparkEntry.queries("q59_jl_ann")(spark, sf).collect()
    val run2 = graft.SparkEntry.queries("q59_jl_ann")(spark, sf).collect()
    assert(run1.toSeq == run2.toSeq)
    assert(run1.length == 1)
    assert(run1.head.getLong(0) == 10L, "n_exact must be 10")
    assert(run1.head.getBoolean(1), "recall_ok must hold")
  }

  test("declared-small-scale exact all-pairs forms refuse oversized input") {
    import spark.implicits._
    val big = spark.range(0, LlmOps.MaxExactAllPairs + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(2.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Sampling.jlCosinePairs(big, 16)
    }
    assert(e.getMessage.contains("declared-small-scale"))
    assert(e.getMessage.contains("q59_jl_ann"),
      "refusal must point at the bucketed scale paths")
    // an explicit override is the sanctioned escape hatch: the guard
    // passes and the (lazy) pair plan builds without enumerating
    val overridden = Sampling.jlCosinePairs(
      big, 16, maxExact = LlmOps.MaxExactAllPairs + 1)
    assert(overridden.columns.toSeq ==
      Seq("vec_a", "vec_b", "dot_red", "cosine_red"))
  }
}
