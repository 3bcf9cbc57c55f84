package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the q44 semantic-curation family, independent
  * of the DuckDB oracles: SemDeDup keep/drop semantics on hand-built
  * vectors, and reciprocal-rank fusion arithmetic on tiny rank lists.
  */
class SemanticSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("semdedup keeps the lowest id of a duplicate pair") {
    val v = Seq(1f, 2f, 3f, 4f, 5f)
    val kept = Semantic.semdedup(
      emb(7L -> v, 3L -> v.map(_ * 2f)), // cosine 1.0, same sign bucket
      0.9).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L))
  }

  test("semdedup never compares across sign buckets") {
    // identical direction on dims 5.. but OPPOSITE sign on dim 1 →
    // different buckets, so even cosine-similar vectors both survive
    val kept = Semantic.semdedup(
      emb(1L -> Seq(0.1f, 1f, 1f, 1f, 9f), 2L -> Seq(-0.1f, 1f, 1f, 1f, 9f)),
      0.4).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("semdedup keeps dissimilar vectors sharing a bucket") {
    // same bucket (all-positive first 4 dims), cosine well under 0.9
    val kept = Semantic.semdedup(
      emb(1L -> Seq(1f, 0.1f, 0.1f, 0.1f, 0f),
          2L -> Seq(0.1f, 1f, 0.1f, 0.1f, 0f)),
      0.9).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("semdedup drop is transitive through the lowest id, not chained") {
    // a≈b (cos 1.0) and b≈c, so both b and c have a smaller similar
    // neighbor → only a survives even though a vs c is also similar
    val v = Seq(2f, 1f, 1f, 1f)
    val kept = Semantic.semdedup(
      emb(1L -> v, 2L -> v.map(_ * 3f), 3L -> v.map(_ * 7f)),
      0.9).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("semdedupBy with an explicit bucket column honors the given clustering") {
    import org.apache.spark.sql.functions._
    val v = Seq(1f, 2f, 3f, 4f, 5f)
    // identical vectors FORCED into different buckets: nothing drops —
    // the pair stage must key on the provided clustering, not recompute
    // its own (this is what makes the IVF swap of q60 a pure key change)
    val separated = emb(1L -> v, 2L -> v)
      .withColumn("bucket", col("vec_id") % 2)
    assert(Semantic.semdedupBy(separated, 0.9).count() == 2)
    // and co-bucketed they dedup exactly like semdedup
    val together = emb(1L -> v, 2L -> v).withColumn("bucket", lit(0L))
    assert(Semantic.semdedupBy(together, 0.9)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("q60_semdedup_ivf contract holds on real data") {
    val row = graft.SparkEntry.queries("q60_semdedup_ivf")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getLong(0) > 0)
    assert(row.getBoolean(1), "assignment_ok")
    assert(row.getBoolean(2), "no_surviving_pair")
    assert(row.getBoolean(3), "min_ids_kept")
  }

  test("topKRanked equals the global-window ranking on a multi-partition input") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // scores with ties (score = id % 7) force the id tie-break to matter
    val scored = (1L to 200L).map(i => (i, (i % 7).toDouble))
      .toDF("id", "score").repartition(8)
    val got = Semantic.topKRanked(scored, "score", "r", 10)
      .select("id", "r").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = scored
      .withColumn("r", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)))
      .filter(col("r") <= 10)
      .select("id", "r").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want)
  }

  test("topKRanked plans a distributed TakeOrderedAndProject for the corpus pass") {
    import spark.implicits._
    val scored = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "score")
      .repartition(8)
    val p = Semantic.topKRanked(scored, "score", "r", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rrfFuse scores both-modality ids above single-modality ids") {
    import spark.implicits._
    val lex = Seq((10L, 1), (11L, 2)).toDF("id", "r_lex")
    val den = Seq((10L, 2), (12L, 1)).toDF("id", "r_den")
    val got = Semantic.rrfFuse(lex, den, 60).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    // id 10: 1/61 + 1/62; id 12: 1/61 alone; id 11: 1/62 alone
    assert(math.abs(got(10L) - (1.0 / 61 + 1.0 / 62)) < 1e-6)
    assert(math.abs(got(12L) - 1.0 / 61) < 1e-6)
    assert(math.abs(got(11L) - 1.0 / 62) < 1e-6)
    assert(got(10L) > got(12L) && got(12L) > got(11L))
  }
}
