package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantizer.HouseM

/** q97 — hash-sharded index under shared frozen models. Contracts
  * named here:
  *
  *   - serving over the sharded layout EQUALS unsharded serving (the
  *     shard is a pure partitioning of the postings: same candidate
  *     set, same ADC doubles — full-outer score-surface comparison
  *     within float-reassociation tolerance);
  *   - the merge is Catalyst's own scatter-gather: the top-k plans as
  *     TakeOrderedAndProject (k rows per partition to the driver),
  *     never a global sort or a hand-rolled by-shard window;
  *   - maintenance is per-shard independent: appending a batch slice
  *     to one shard and compacting that shard leave the other shards'
  *     subtrees untouched ((path, size) listing snapshots; part-file
  *     names are per-job unique, so any rewrite changes the listing);
  *   - coverage is closed-form (base + the appended slice, ids unique).
  */
class ShardedIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q97_sharded_index: serve equivalence, scatter-gather plan, " +
      "and per-shard maintenance isolation") {
    val row = SparkEntry.queries("q97_sharded_index")(spark, sf).collect()(0)
    val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") =!= 0)
    val nBase = e.filter(pmod(col("vec_id"), lit(10)) =!= 9).count()
    val nSlice1 = e.filter(pmod(col("vec_id"), lit(10)) === 9 &&
      pmod(col("vec_id"), lit(4)) === 1).count()
    assert(nSlice1 >= 1, "fixture precondition: shard 1 receives a batch")
    assert(row.getAs[Long]("n_base") == nBase)
    assert(row.getAs[Long]("n_shard1_batch") == nSlice1)
    assert(row.getAs[Long]("n_sharded") == nBase + nSlice1,
      "the sharded tree must cover base + exactly the appended slice")
    assert(row.getAs[Boolean]("ids_unique"),
      "sharding must not duplicate a posting")
    assert(row.getAs[Boolean]("serve_matches_unsharded"),
      "shared models: union of shard postings = unsharded postings, " +
        "so the score surfaces must agree per row")
    assert(row.getAs[Boolean]("compact_serve_identical"),
      "compacting one shard's generations must not change a single score")
    assert(row.getAs[Boolean]("scatter_gather_plan"),
      "the sharded top-k must plan as TakeOrderedAndProject")
    assert(row.getAs[Boolean]("append_isolated"),
      "appending shard 1's slice must leave shards 0/2/3 untouched")
    assert(row.getAs[Boolean]("compact_isolated"),
      "compacting shard 1 must leave shards 0/2/3 untouched")
  }

  test("q97_sharded_serve: bounded scatter-gather serve over the " +
      "prewarmed sharded layout") {
    val row = SparkEntry.queries("q97_sharded_serve")(spark, sf).collect()(0)
    for (c <- Seq("k_bounded", "cells_ok", "finite_ok", "nonneg_ok",
        "scatter_gather_plan"))
      assert(row.getAs[Boolean](c), s"$c must hold")
  }

  test("sharded serve returns the identical top-k ids, in order, as " +
      "unsharded serve over the same logical content") {
    import graft.operators.ProductQuantizer
    val idx = graft.queries.LlmOps.ensureAnnServeIndex(spark, sf)
    val shDir = graft.queries.LlmOps.ensureShardedServeLayout(spark, sf)
    val coarseF = spark.read.parquet(s"$idx/coarse")
    val booksF = spark.read.parquet(s"$idx/books")
    val query = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding")).limit(1)
    def top(codes: org.apache.spark.sql.DataFrame): Seq[Long] =
      ProductQuantizer.ivfPqTopK(query, "embedding", HouseM, coarseF, booksF,
          codes.select(col("cell_id"), col("vec_id"), col("codes")),
          "vec_id", nProbe = 4, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    val sharded = top(spark.read.parquet(shDir))
    val unsharded = top(spark.read.parquet(s"$idx/codes"))
    // identical doubles scored under the same (adc_dist, vec_id) order:
    // the merge is lossless, so even the tie-breaks agree
    assert(sharded == unsharded)
  }
}
