package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantizer
import graft.operators.ProductQuantizer.HouseM

/** q99 — the composed serving stack (shard partitioning + label
  * pushdown + exact refine on one layout). Contracts named here:
  *
  *   - the COMPOSITION THEOREM: the stacked answer is id-for-id
  *     identical (order included) to the same two stages over q95's
  *     unsharded codes_meta layout — both read the same postings,
  *     probe the same cells, score the same doubles, and rank under
  *     the same (distance, vec_id) total order, so the shard
  *     partitioning and the metadata carry change NOTHING about the
  *     answer, only about maintenance and scan pruning;
  *   - every layer's plan property holds in the registered query
  *     (label pushdown, scatter-gather merge, pruned refine fetch —
  *     the requires inside refuse on silent degradation; the emitted
  *     booleans are re-asserted here).
  */
class StackServeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q99_stack_serve: all three layers' plan properties hold") {
    val row = SparkEntry.queries("q99_stack_serve")(spark, sf).collect()(0)
    for (c <- Seq("k_bounded", "all_labeled", "finite_ok", "nonneg_ok",
        "label_pushed", "scatter_gather_plan", "fetch_pruned"))
      assert(row.getAs[Boolean](c), s"$c must hold")
  }

  test("composition theorem: the stacked pipeline returns id-for-id " +
      "the same refined top-k as the unsharded codes_meta pipeline") {
    val idx = graft.queries.LlmOps.ensureAnnServeIndex(spark, sf)
    val stackDir = graft.queries.LlmOps.ensureStackServeLayout(spark, sf)
    val metaDir = graft.queries.LlmOps.ensureFilteredServeLayout(spark, sf)
    val rawDir = graft.queries.LlmOps.ensureRefineServeLayout(spark, sf)
    val coarseF = spark.read.parquet(s"$idx/coarse")
    val booksF = spark.read.parquet(s"$idx/books")
    val query = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding")).limit(1)
    val lbl = 3

    def pipeline(codesSrc: DataFrame): Seq[(Long, Double)] = {
      val cands = ProductQuantizer.ivfPqScores(query, "embedding", HouseM,
          coarseF, booksF,
          codesSrc.select(col("cell_id"), col("vec_id"), col("codes")),
          "vec_id", nProbe = 4)
        .orderBy(col("adc_dist").asc, col("vec_id").asc).limit(40)
      val ids = cands.select(col("vec_id")).collect().map(_.getLong(0))
      val fetched = spark.read.parquet(rawDir)
        .filter(col("vec_id").isin(ids.toSeq: _*))
      ProductQuantizer.exactRerank(fetched.select(col("vec_id")),
          fetched, "vec_id", "embedding", query, "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }

    val stacked = pipeline(
      spark.read.parquet(stackDir).filter(col("label") === lbl))
    val unsharded = pipeline(
      spark.read.parquet(metaDir).filter(col("label") === lbl))
    assert(stacked.map(_._1) == unsharded.map(_._1),
      s"stacked $stacked must rank the same ids as unsharded $unsharded")
    assert(stacked.zip(unsharded).forall { case ((_, a), (_, b)) =>
      math.abs(a - b) <= 1e-9 },
      "per-id exact distances must agree within reassociation tolerance")
    assert(stacked.nonEmpty)
  }
}
