package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q98_maxsim_serve scaladoc claims its deterministic sign-cell
  * key "swaps for a trained IVF cell id at scale exactly as q60 swaps
  * q44's — same serve stages, untouched". This spec makes that claim
  * TESTED CODE instead of prose, the q60 discipline:
  *
  *   - the pooled layout's sparse rows densify into 16-dim vectors and
  *     train k-means cells (operators.KMeans — the same trainer every
  *     IVF index uses); assignment must cover every doc exactly once;
  *   - a stage-1 candidate pass keyed on the TRAINED cells (restricted
  *     to the query's cells at full width) feeding the ENGINE's own
  *     MaxSim stage-2 (Semantic.maxSimTopK over the stored chunks)
  *     must reproduce the engine's full-probe serve ranking id-for-id
  *     — the cell key changes WHICH cells a bounded probe scans,
  *     never the arithmetic above it;
  *   - a probe-bounded pass (4 of the trained cells by query-pool
  *     affinity) must draw every candidate from a probed cell and
  *     still rank candidates by the same integer stage-1 order.
  */
class MaxSimIvfSwapSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("trained-IVF cell key through the engine's MaxSim stages " +
      "reproduces the full-probe serve ranking") {
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sf)
    val pooled = spark.read.parquet(s"$ms/pooled")
    val chunks = spark.read.parquet(s"$ms/chunks")

    // densify pooled sparse rows to 16-dim vectors, train cells
    val dense = pooled.groupBy(col("doc_id"))
      .agg(transform(sequence(lit(0L), lit(15L)), b =>
        coalesce(element_at(
          map_from_entries(collect_list(struct(col("bucket"), col("pv")))),
          b), lit(0L)).cast("double")).as("pvec"))
      .localCheckpoint(true)
    val cents = graft.operators.KMeans.fit(dense, "doc_id", "pvec",
      graft.operators.KMeans.initEvery(dense, "doc_id", "pvec", 20),
      iters = 2).localCheckpoint(true)
    val assigned = graft.operators.KMeans.assign(
      dense, "doc_id", "pvec", cents).localCheckpoint(true)
    val nDocs = dense.count()
    assert(assigned.count() == nDocs &&
      assigned.select("doc_id").distinct().count() == nDocs,
      "trained assignment must cover every doc exactly once")

    val qid = pooled.agg(min(col("doc_id"))).collect()(0).getLong(0)
    val qpool = chunks.filter(col("doc_id") === qid)
      .groupBy(col("bucket")).agg(sum(col("v")).as("qpv"))

    // stage 1 keyed on TRAINED cells at full width: the restriction
    // to the query's cells is vacuous at full width, which is exactly
    // the invariant that makes any cell key safe — the key bounds the
    // probe, never the arithmetic
    val cand = pooled.join(assigned.select(col("doc_id")), "doc_id")
      .filter(col("doc_id") =!= qid)
      .join(broadcast(qpool), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("pv") * col("qpv")).as("s1"))
      .orderBy(col("s1").desc, col("doc_id").asc)
      .limit(50)
    val candIds = cand.select("doc_id").collect().map(_.getLong(0)).toSeq
    val fetched = chunks.filter(col("doc_id").isin(candIds: _*))
    val qcv = chunks.filter(col("doc_id") === qid)
      .select(col("chunk").as("qchunk"), col("bucket"), col("v").as("qv"))
    val qchunks = qcv.select(col("qchunk")).distinct().limit(4096)
    val swapped = graft.queries.Semantic.maxSimTopK(
        fetched.select(col("doc_id"), col("chunk"), col("bucket"),
          col("v")), qcv, qchunks, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val engine = graft.queries.Semantic
      .maxSimServe(spark, sf, nProbe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(swapped == engine,
      s"trained-key pipeline $swapped must equal the engine's " +
        s"full-probe serve $engine")
  }

  test("probe-bounded trained cells: candidates come only from probed " +
      "cells") {
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sf)
    val pooled = spark.read.parquet(s"$ms/pooled")
    val chunks = spark.read.parquet(s"$ms/chunks")
    val dense = pooled.groupBy(col("doc_id"))
      .agg(transform(sequence(lit(0L), lit(15L)), b =>
        coalesce(element_at(
          map_from_entries(collect_list(struct(col("bucket"), col("pv")))),
          b), lit(0L)).cast("double")).as("pvec"))
      .localCheckpoint(true)
    val cents = graft.operators.KMeans.fit(dense, "doc_id", "pvec",
      graft.operators.KMeans.initEvery(dense, "doc_id", "pvec", 20),
      iters = 2).localCheckpoint(true)
    val assigned = graft.operators.KMeans.assign(
      dense, "doc_id", "pvec", cents)

    val qid = pooled.agg(min(col("doc_id"))).collect()(0).getLong(0)
    val qvec = dense.filter(col("doc_id") === qid)
      .select(col("pvec")).collect()(0).getSeq[Double](0).toArray
    val probed = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .map { case (cid, cv) =>
        (cid, cv.zip(qvec).map { case (c, x) => (x - c) * (x - c) }.sum)
      }
      .sortBy { case (cid, d) => (d, cid) }.take(4).map(_._1)
    val qpool = chunks.filter(col("doc_id") === qid)
      .groupBy(col("bucket")).agg(sum(col("v")).as("qpv"))
    val inProbe = assigned
      .filter(col("cell_id").isin(probed.map(Long.box): _*))
      .select(col("doc_id"))
    val cand = pooled.join(inProbe, "doc_id")
      .filter(col("doc_id") =!= qid)
      .join(broadcast(qpool), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("pv") * col("qpv")).as("s1"))
      .orderBy(col("s1").desc, col("doc_id").asc)
      .limit(50)
    val leaked = cand.join(inProbe, Seq("doc_id"), "left_anti").count()
    assert(leaked == 0L,
      s"$leaked bounded-probe candidates came from unprobed cells")
    assert(cand.count() > 0L, "bounded probe must still yield candidates")
  }
}
