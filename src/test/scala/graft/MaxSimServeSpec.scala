package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q98_maxsim_serve — the late-interaction rerank answered from the
  * persisted chunk-vector/pooled layouts. Contracts named here:
  *
  *   - the EQUIVALENCE THEOREM (the r15 lead item's "done" bar): at
  *     full probe width (all 16 sign cells) the serve pipeline returns
  *     id-for-id, score-for-score the SAME top-10 as the from-raw
  *     q98_maxsim_rerank pipeline. Both compute identical integer
  *     arithmetic — the stored layouts are views of the same
  *     featurization (one implementation: Semantic.chunkVectors), the
  *     unprobed-cell restriction vanishes at full width, and stage-1 /
  *     MaxSim orderings share the same integer total order — so this
  *     is equality, not tolerance;
  *   - LAYOUT FAITHFULNESS: the stored chunks layout equals the
  *     from-raw featurization row-for-row (full outer join, zero
  *     mismatches) — the persisted artifact can never drift from what
  *     the from-raw pipeline would compute;
  *   - the probe-bounded registered query's structural properties:
  *     ≤ 10 rows, integer scores present, and the plan requires inside
  *     maxSimServe (cell In-list pushdown, candidate fetch pushdown)
  *     did not throw;
  *   - probe MONOTONICITY: widening the probe set can only grow the
  *     stage-1 candidate pool, so the nProbe=16 score of any doc the
  *     nProbe=4 top-10 contains is identical (same integer MaxSim,
  *     candidate-set independent) — checked by joining the two runs.
  */
class MaxSimServeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("equivalence theorem: full-probe serve == from-raw rerank, " +
      "id-for-id and score-for-score") {
    val fromRaw = SparkEntry.queries("q98_maxsim_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val served = graft.queries.Semantic
      .maxSimServe(spark, sf, nProbe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == fromRaw,
      s"full-probe serve $served must equal from-raw $fromRaw exactly")
    assert(served.nonEmpty)
  }

  test("equivalence theorem re-proven on the TRAINED cell key (r16): " +
      "full-probe IVF-layout serve == from-raw rerank, id-for-id") {
    val fromRaw = SparkEntry.queries("q98_maxsim_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ms = graft.queries.Semantic
      .ensureMaxSimIvfServeLayout(spark, sf)
    val nCells = spark.read.parquet(s"$ms/ivf_cents").count().toInt
    assert(nCells >= 2, "trained layout must have at least 2 cells")
    val (top, probed, cellsPushed, fetchPruned) = graft.queries.Semantic
      .maxSimServeIvf(spark, sf, nProbe = nCells, k = 10)
    assert(probed.size == nCells && cellsPushed && fetchPruned)
    val served = top.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == fromRaw,
      s"full-probe trained-key serve $served must equal from-raw " +
        s"$fromRaw exactly — the cell key bounds the probe, never " +
        "the arithmetic")
  }

  test("registered q103_maxsim_ivf_serve contracts hold") {
    val row = SparkEntry.queries("q103_maxsim_ivf_serve")(spark, sf)
      .collect()(0)
    assert(row.getAs[Long]("n_docs") >= 1L)
    for (c <- Seq("nonempty", "k_bounded", "finite_ok", "in_probe_ok",
        "cells_pushed", "fetch_pruned"))
      assert(row.getAs[Boolean](c), s"$c must hold")
  }

  test("layout faithfulness: stored chunks == from-raw featurization " +
      "row-for-row") {
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sf)
    val stored = spark.read.parquet(s"$ms/chunks")
      .select(col("doc_id"), col("chunk"), col("bucket"),
        col("v").as("v_stored"))
    val fresh = graft.queries.Semantic
      .chunkVectors(Tables.load(spark, sf, "documents"))
      .select(col("doc_id"), col("chunk"), col("bucket"),
        col("v").as("v_fresh"))
    val mismatches = stored.join(fresh,
        Seq("doc_id", "chunk", "bucket"), "full")
      .filter(col("v_stored").isNull || col("v_fresh").isNull ||
        col("v_stored") =!= col("v_fresh"))
      .count()
    assert(mismatches == 0L,
      s"$mismatches stored chunk rows diverge from the featurization")
  }

  test("registered probe-bounded query: bounded, integer, plan guards " +
      "hold (the requires inside did not throw)") {
    val rows = SparkEntry.queries("q98_maxsim_serve")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // descending maxsim, ties on doc_id ascending — the declared order
    val scores = rows.map(r => (r.getLong(1), r.getLong(0))).toSeq
    assert(scores == scores.sortBy { case (m, id) => (-m, id) },
      "top-10 must be ordered by (maxsim desc, doc_id)")
  }

  test("probe monotonicity: a doc in the nProbe=4 top-10 carries the " +
      "same integer MaxSim score at nProbe=16") {
    val narrow = graft.queries.Semantic
      .maxSimServe(spark, sf, nProbe = 4, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = graft.queries.Semantic
      .maxSimServe(spark, sf, nProbe = 16, k = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missingScores = narrow.filter { case (id, m) =>
      wide.get(id).exists(_ != m)
    }
    assert(missingScores.isEmpty,
      s"scores must be candidate-set independent: $missingScores")
  }
}
