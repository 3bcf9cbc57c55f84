package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q90 — the retrain handoff with the GAP FOLD itself off the trigger
  * (r12's lead finding closed): the switching trigger writes a durable
  * fold request over the sealed gap range instead of re-encoding it
  * inline; a concurrent worker folds; a later trigger adopts
  * fold+pointer with one switch write; serving stays on the OLD
  * pointer (internally consistent) until adoption. The two named
  * proofs the verdict asked for: appends land DURING the gap fold, and
  * post-adoption serving is row-identical to the one-shot re-encode.
  */
class StreamRetrainFoldSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("appends land during the gap fold, no pre-adoption trigger " +
      "serves the new pointer, and post-adoption serving equals the " +
      "one-shot re-encode") {
    val row = StreamOps.streamIndexRetrainFoldAsync(spark, sf).collect()(0)
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val n = emb.count()
    val nClean = emb.filter(pmod(col("vec_id"), lit(10)) === 8).count()
    assert(row.getAs[Long]("n_triggers") == 8,
      "8 triggers (clean, drift, 2 gap, 3 fold-phase, post)")
    assert(row.getAs[Boolean]("clean_quiet"), "clean/gap/fold phases must not fire")
    assert(row.getAs[Boolean]("drift_fires_once"), "the drifted batch fires exactly once")
    assert(row.getAs[Boolean]("gaps_inflight"),
      "both gap batches land while the RETRAIN is in flight")
    assert(row.getAs[Long]("n_fold_requests") == 2,
      "two fold requests: the sealed gap (3..5), then the residual " +
        "(6..7) — the catch-up recursion, each off the trigger")
    assert(row.getAs[Long]("n_gens_during_fold") == 1,
      "gen 6 must append WHILE fold #1 runs — the gap fold never " +
        "stalls ingestion")
    assert(row.getAs[Boolean]("old_pointer_until_adopted"),
      "no trigger before the adoption may serve the retrained " +
        "pointer — mixing models would make ADC scores incomparable; " +
        "the old pointer stays internally consistent until the fold " +
        "fully covers the gap")
    assert(row.getAs[Long]("n_adopted_in_stream") == 1, "exactly one in-stream adoption (gen 8)")
    assert(row.getAs[Boolean]("post_on_retrained"),
      "the post batch runs ON the retrained pointer — the adoption " +
        "happened in-stream, one switch write")
    assert(row.getAs[Boolean]("post_quiet"), "the merged-distribution post batch is quiet")
    assert(row.getAs[Long]("n_index") == 2 * n + 3 * nClean,
      "serving covers base + every arrival exactly once")
    assert(row.getAs[Boolean]("ids_unique"), "no id served twice")
    assert(row.getAs[Boolean]("ptr_reads_bounded"),
      "quiet triggers read at most ONE switch record and adopting " +
        "triggers at most three (pointer + archival consolidation) — " +
        "O(1) in switch history either way (r13 lead finding + q94)")
    assert(row.getAs[Boolean]("same_as_oneshot_fold"),
      "serving (retrained codes ∪ async-folded gaps ∪ post-adoption " +
        "appends) must be row-identical to a one-shot re-encode of " +
        "all post-snapshot raws under the same persisted model")
    assert(row.getAs[Long]("n_results") == 10)
    // physical shape: the adopted retrain directory carries fold
    // generations for exactly the gap gens 3..7
    val idx = graft.RunPaths.scratch(
      s"graft_q90_index_${graft.RunPaths.keyFor(sf)}")
    val foldGens = StreamOps.genDirs(spark, s"$idx/retrain/req=2/fold", "gen=")
    assert(foldGens == Seq(3L, 4L, 5L, 6L, 7L),
      "the two fold workers cover the whole gap, disjointly")
  }

  test("live second retrain cycle: a drifted gen 9 fires against the " +
      "adopted pointer, and the maintenance belt adopts cycle 2 with " +
      "NO fold — cycle 1's scaffolding was closed at its adoption, so " +
      "nothing drags the seal under the new snapshot boundary") {
    val row = StreamOps
      .streamIndexRetrainFoldAsync(spark, sf, postShifted = true)
      .collect()(0)
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val n = emb.count()
    val nClean = emb.filter(pmod(col("vec_id"), lit(10)) === 8).count()
    assert(row.getAs[Long]("n_triggers") == 9)
    assert(row.getAs[Boolean]("clean_quiet"))
    assert(!row.getAs[Boolean]("drift_fires_once"),
      "two requests fired — the loop stays armed after cycle 1")
    assert(row.getAs[Boolean]("gaps_inflight"))
    assert(row.getAs[Long]("n_fold_requests") == 2,
      "cycle 2 must NOT fold: its snapshot covers gens 1-9, so the " +
        "belt adopts directly — cycle 1's fold requests (ids 5, 7) " +
        "were swept at its adoption (close-cycle), and a third fold " +
        "request here would mean the seal started under the new " +
        "snapshot boundary")
    assert(row.getAs[Long]("n_adopted_in_stream") == 1,
      "cycle 2's adoption happens in the maintenance belt, unlogged")
    assert(!row.getAs[Boolean]("old_pointer_until_adopted"),
      "gen 9 runs ON cycle 1's retrained pointer by design (this " +
        "column counts non-post phases on a retrained pointer)")
    assert(row.getAs[Boolean]("post_on_retrained"))
    assert(row.getAs[Boolean]("post_quiet"))
    assert(row.getAs[Boolean]("ptr_reads_bounded"),
      "per-trigger record reads stay ≤ 1 with TWO switches in history")
    assert(row.getAs[Long]("n_index") == 3 * n + 3 * nClean,
      "cycle 2 serves base + every arrival 1-9 exactly once — a " +
        "re-encoded duplicate of gens 8-9 (the ADVICE-a bug) would " +
        "inflate this and break ids_unique")
    assert(row.getAs[Boolean]("ids_unique"),
      "a re-encoded duplicate of gens 8-9 into a snapshot that " +
        "already carries them (the ADVICE-a hazard — now structurally " +
        "removed by the close-cycle sweep, with the max(rr, …) seal " +
        "guard kept for the sweep's crash window and pinned against " +
        "planted stale state in FoldMachineSpec) would break this")
    assert(row.getAs[Boolean]("same_as_oneshot_fold"))
    assert(row.getAs[Long]("n_results") == 10)
    // physical shape: BOTH switches durable; cycle 2's retrain dir
    // has NO fold generations (nothing left to fold)
    val idx = graft.RunPaths.scratch(
      s"graft_q90_index_${graft.RunPaths.keyFor(sf)}_ps")
    assert(StreamOps.genDirs(spark, s"$idx/switch", "req=") == Seq(2L, 9L))
    assert(StreamOps.genDirs(spark, s"$idx/retrain/req=9/fold", "gen=").isEmpty)
  }
}
