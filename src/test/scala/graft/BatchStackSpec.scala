package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantizer
import graft.operators.ProductQuantizer.HouseM

/** q102_batch_stack — a query TABLE over the composed serving stack
  * (sharded + label-filtered + refined). Contracts named here:
  *
  *   - BATCH ≡ SINGLE-QUERY STACK, per query: for EVERY qid in the
  *     batch, the batch answer equals the q99-shaped single-query
  *     pipeline (label-filtered stack scan → ivfPqScores top-m →
  *     exact rerank) run with that query's OWN label. Probe selection,
  *     LUT arithmetic, fold order and the (distance, id) total order
  *     are shared, so this is arithmetic identity per query.
  *   - every batch result row matches its query's label (recomputed
  *     from the result set, not assumed from the filter).
  *   - the registered query's structural contracts hold.
  */
class BatchStackSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("batch ≡ single-query stacked serving for every query — both " +
      "stages, each query under its own label") {
    val idx = graft.queries.LlmOps.ensureAnnServeIndex(spark, sf)
    val stackDir = graft.queries.LlmOps.ensureStackServeLayout(spark, sf)
    val bucketedDir =
      graft.queries.LlmOps.ensureRefineBucketedLayout(spark, sf)
    val coarseF = spark.read.parquet(s"$idx/coarse")
    val booksF = spark.read.parquet(s"$idx/books")
    val emb = Tables.load(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") =!= 0)
      .filter(pmod(col("vec_id"), lit(17)) === 1)
      .orderBy(col("vec_id")).limit(32)
      .select(col("vec_id").as("qid"), col("embedding"), col("label"))
      .localCheckpoint(true)
    val qrows = queries.select("qid", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    assert(qrows.nonEmpty)

    val qLabels = qrows.map(_._2).distinct.sorted
    val filtered = spark.read.parquet(stackDir)
      .filter(col("label").isin(qLabels.map(Int.box): _*))
      .select(col("cell_id"), col("vec_id"), col("codes"), col("label"))
    val cands = ProductQuantizer.ivfPqTopKBatchFiltered(queries, "qid",
        "embedding", "label", HouseM, coarseF, booksF, filtered,
        "vec_id", nProbe = 4, k = 40, knownQ = 32)
      .select(col("qid"), col("vec_id"))
      .localCheckpoint(true)
    val (fetched, pruned) = graft.queries.LlmOps.batchPrunedFetch(
      spark, bucketedDir, cands, "vec_id", maxBuckets = 32 * 40)
    assert(pruned)
    val batch = ProductQuantizer.exactRerankBatch(cands, fetched,
        "vec_id", "embedding", queries, "qid", "embedding", 10)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }

    def close(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Boolean =
      a.map(_._1) == b.map(_._1) &&
        a.zip(b).forall { case ((_, x), (_, y)) => math.abs(x - y) <= 1e-9 }

    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((qid, qlabel) <- qrows) {
      // the q99 single-query shape with THIS query's label
      val query = emb.filter(col("vec_id") === qid)
        .select(col("embedding")).limit(1)
      val oneFiltered = spark.read.parquet(stackDir)
        .filter(col("label") === qlabel)
        .select(col("cell_id"), col("vec_id"), col("codes"))
      val oneCands = ProductQuantizer.ivfPqScores(query, "embedding",
          HouseM, coarseF, booksF, oneFiltered, "vec_id", nProbe = 4)
        .orderBy(col("adc_dist").asc, col("vec_id").asc)
        .limit(40)
      val oneRef = ProductQuantizer.exactRerank(
          oneCands.select(col("vec_id")),
          Tables.load(spark, sf, "embeddings")
            .select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", query, "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch.getOrElse(qid, Seq.empty)
      assert(close(got, oneRef),
        s"qid=$qid label=$qlabel: batch stack diverges from the " +
          s"single-query q99 shape (${got.map(_._1)} vs " +
          s"${oneRef.map(_._1)})")
      assert(got.forall { case (id, _) => labelOf(id) == qlabel },
        s"qid=$qid: a batch result row does not match the query label")
    }
  }

  test("registered q102_batch_stack contracts hold") {
    val row = SparkEntry.queries("q102_batch_stack")(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_queries") >= 1L)
    for (c <- Seq("all_served", "k_bounded", "ranks_contiguous",
        "all_labeled", "finite_ok", "nonneg_ok", "label_pushed",
        "batch_partial_agg", "fetch_file_pruned"))
      assert(row.getAs[Boolean](c), s"$c must hold")
  }
}
