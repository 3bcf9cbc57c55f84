package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The drift loop with the ASYNC retrain handoff (q86): the fired
  * trigger REQUESTS a retrain and keeps streaming; a concurrent thread
  * trains over the persisted snapshot; the first trigger to see the
  * done marker folds the gap generations and flips the pointer. The
  * query's own contract covers the happy path; this spec restates the
  * load-bearing parts with names and adds the negative control the row
  * cannot carry — the loop stays ARMED against the retrained model.
  *
  * The overlap contract ("appends land DURING the retrain") is
  * structural, not timing-based: the retrain thread is gated on gen 4's
  * trigger completing, so it CANNOT finish before both gap triggers
  * have logged their inflight flags — the
  * inflight flags are deterministic, the artificially-slowed-retrain
  * shape without a sleep race.
  */
class StreamRetrainAsyncSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("appends land DURING the retrain, the switch folds them, and " +
      "post-switch serving equals a one-shot re-encode (inline parity)") {
    val row = StreamOps.streamIndexRetrainAsync(spark, sf).collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getAs[Long]("n_triggers") == 5, "5 triggers (clean, drift, 2 gap, post)")
    assert(row.getAs[Boolean]("clean_quiet"), "clean and gap batches must not fire")
    assert(row.getAs[Boolean]("drift_fires_once"), "the drifted batch fires exactly once")
    assert(row.getAs[Boolean]("gaps_inflight"),
      "both gap batches must land while the retrain is IN FLIGHT — " +
        "the stream does not stall on training")
    assert(row.getAs[Boolean]("post_on_retrained"),
      "the post batch must run on the RETRAINED pointer — the switch " +
        "happened in-stream, not in teardown")
    assert(row.getAs[Boolean]("post_quiet"),
      "the merged-distribution post batch appends quietly on the new index")
    assert(row.getAs[Long]("n_index") == 2 * n,
      "serving covers base + every arrival exactly once")
    assert(row.getAs[Boolean]("ids_unique"), "no id served twice")
    assert(row.getAs[Boolean]("same_as_oneshot_fold"),
      "streamed serving state (retrained codes ∪ folded gaps ∪ " +
        "post-switch appends) must be row-identical to the one-shot " +
        "batch re-encode under the same persisted model — the async " +
        "handoff is invisible to queries, like the inline path")
    assert(row.getAs[Boolean]("ptr_reads_bounded"),
      "no trigger may read more than ONE switch record — the pointer " +
        "derivation is O(1) in switch history (r13 lead finding)")
    assert(row.getAs[Long]("n_results") == 10)
  }

  test("restart recovery: a request whose launcher died before starting " +
      "the thread is re-armed from durable state by the next trigger — " +
      "every contract identical to the healthy run") {
    // dieAfterRequest simulates the exact window recovery exists for:
    // the durable request record landed, the thread never started (a
    // driver death between the two). Gen 3's re-arm must launch from
    // the record alone; nothing downstream may be able to tell.
    val row = StreamOps
      .streamIndexRetrainAsync(spark, sf, dieAfterRequest = true)
      .collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getAs[Long]("n_triggers") == 5)
    assert(row.getAs[Boolean]("clean_quiet"), "clean and gap batches quiet")
    assert(row.getAs[Boolean]("drift_fires_once"), "the drifted batch fires exactly once")
    assert(row.getAs[Boolean]("gaps_inflight"),
      "the re-armed retrain still overlaps both gap batches")
    assert(row.getAs[Boolean]("post_on_retrained"), "the post batch runs on the retrained pointer")
    assert(row.getAs[Boolean]("post_quiet"), "post quiet")
    assert(row.getAs[Long]("n_index") == 2 * n)
    assert(row.getAs[Boolean]("ids_unique"))
    assert(row.getAs[Boolean]("same_as_oneshot_fold"),
      "recovery must be invisible to serving — row-identical one-shot")
    assert(row.getAs[Long]("n_results") == 10)
  }

  test("the loop stays ARMED after the handoff: a re-drifted post batch " +
      "fires a SECOND request against the retrained model; the " +
      "maintenance switch adopts it, coverage stays exact") {
    val row = StreamOps.streamIndexRetrainAsync(spark, sf, postShifted = true)
      .collect()(0)
    val n = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getAs[Long]("n_triggers") == 5)
    assert(row.getAs[Boolean]("clean_quiet"), "clean and gap batches still quiet")
    assert(!row.getAs[Boolean]("drift_fires_once"),
      "two requests fired — drift_fires_once is the once-only flag")
    assert(row.getAs[Boolean]("gaps_inflight"), "gap batches still land in flight")
    assert(row.getAs[Boolean]("post_on_retrained"),
      "the post batch still runs on the first retrained pointer")
    assert(!row.getAs[Boolean]("post_quiet"),
      "a re-drifted post batch must FIRE against the retrained model")
    assert(row.getAs[Long]("n_index") == 2 * n,
      "the second retrain (adopted by the maintenance switch) still " +
        "covers every row exactly once")
    assert(row.getAs[Boolean]("ids_unique"))
    assert(row.getAs[Boolean]("same_as_oneshot_fold"),
      "after the maintenance switch the one-shot comparison collapses " +
        "to the retrained base generation — still row-identical")
    assert(row.getAs[Boolean]("ptr_reads_bounded"),
      "with TWO switches in history the per-trigger record reads stay " +
        "≤ 1 — membership checks ride the listing, only the pointer " +
        "reads (the max record)")
    assert(row.getAs[Long]("n_results") == 10)
  }
}
