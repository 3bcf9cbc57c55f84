package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SwitchLog's archival checkpoint (q94) at the operator level — the
  * consolidation itself plus the crash windows the write order must
  * absorb, driven against planted records (the end-to-end shape is
  * FoldMachineSpec's close-cycle test and the registered
  * q94_switch_archive):
  *
  *   - archive moves everything but the newest `keep` into ONE
  *     parquet; live listing bounded, history complete, pointer still
  *     one read, audit answers from archived history at O(keep) reads;
  *   - crash window A: an archived record's LIVE directory survives
  *     (sweep died) — readers dedup, the audit scan does not trip its
  *     monotonicity belt, the next archive call converges;
  *   - crash window B: a superseded archive checkpoint survives — the
  *     union dedups, the next call consolidates back to one;
  *   - keep ≥ 1 is enforced (the newest record must stay live: the
  *     pointer and the write-order check read only the live listing).
  */
class SwitchArchiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(tag: String): String =
    s"${java.nio.file.Files.createTempDirectory(s"switcharch_$tag")}/switch"

  /** A record directory WITHOUT SwitchLog.write's ordering gate — for
    * planting crash-window states the production path cannot reach. */
  private def plantRecord(
      root: String, req: Long, folded: Long, atGen: Long): Unit = {
    spark.range(1)
      .select(lit(req).as("req"), lit(folded).as("folded_through"),
        lit(atGen).as("at_gen"))
      .write.mode("overwrite").parquet(s"$root/req=$req")
    ()
  }

  test("archive bounds the live listing, keeps history complete, and " +
      "the audit path answers from archived history at O(keep) reads") {
    val root = freshRoot("basic")
    for (r <- 1L to 5L) SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    assert(SwitchLog.archive(spark, root, keep = 2) == 3L)
    assert(SwitchLog.adopted(spark, root) == Seq(4L, 5L),
      "live dirs bounded at keep")
    assert(SwitchLog.archives(spark, root) == Seq(3L),
      "one consolidated checkpoint, keyed by the max archived req")
    assert(SwitchLog.historyReqs(spark, root) == (1L to 5L),
      "archive ∪ live is the complete adopted history")
    val reads0 = SwitchLog.recordReads(root)
    assert(SwitchLog.pointer(spark, root).contains((5L, 50L)),
      "the pointer is untouched by archival — newest stays live")
    assert(SwitchLog.recordReads(root) == reads0 + 1)
    // audit: answer req=2 sits in the archive; one archive job + the
    // first live record short-circuits
    val reads1 = SwitchLog.recordReads(root)
    assert(SwitchLog.pointerAsOf(spark, root, 25L).contains((2L, 20L)))
    assert(SwitchLog.recordReads(root) - reads1 <= 2,
      "audit reads are one archive job + O(keep), not O(adoptions)")
    // re-archival is a no-op at the bound, and idempotent
    assert(SwitchLog.archive(spark, root, keep = 2) == 0L)
  }

  test("crash window A: an archived record's live directory survives " +
      "the sweep — reads dedup, the monotonicity belt holds, and the " +
      "next archive call converges") {
    val root = freshRoot("livecrash")
    for (r <- 1L to 3L) SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    assert(SwitchLog.archive(spark, root, keep = 1) == 2L)
    // resurrect req=2's live dir: the state a sweep crash leaves
    plantRecord(root, 2L, 20L, 21L)
    assert(SwitchLog.adopted(spark, root) == Seq(2L, 3L))
    // the audit scan skips live records at-or-below the archive
    // boundary (they are duplicates of archived facts) — without the
    // skip, req=2's at_gen would re-appear after the archive already
    // advanced past it and trip the monotonicity require
    assert(SwitchLog.pointerAsOf(spark, root, 99L).contains((3L, 30L)))
    assert(SwitchLog.pointerAsOf(spark, root, 25L).contains((2L, 20L)))
    assert(SwitchLog.historyReqs(spark, root) == Seq(1L, 2L, 3L),
      "dedup by req: the doubled record counts once")
    // the next archival converges the duplicate away
    assert(SwitchLog.archive(spark, root, keep = 1) == 1L)
    assert(SwitchLog.adopted(spark, root) == Seq(3L))
    assert(SwitchLog.archives(spark, root) == Seq(2L) &&
      SwitchLog.historyReqs(spark, root) == Seq(1L, 2L, 3L))
  }

  test("mixed window: one archival carries BOTH a swept-behind live " +
      "leftover and genuinely new records — the checkpoint advances " +
      "to a strictly newer key, never rewriting in place") {
    val root = freshRoot("mixed")
    for (r <- 1L to 3L) SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    assert(SwitchLog.archive(spark, root, keep = 1) == 2L) // upto=2
    plantRecord(root, 2L, 20L, 21L) // the half-sweep leftover
    for (r <- 4L to 5L) SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    // live = {2, 3, 4, 5}: toArchive = {2, 3, 4} spans the leftover
    // (already in upto=2) and two new records — the write goes to the
    // NEW key upto=4 as a superset, then upto=2 is swept
    assert(SwitchLog.archive(spark, root, keep = 1) == 3L)
    assert(SwitchLog.adopted(spark, root) == Seq(5L))
    assert(SwitchLog.archives(spark, root) == Seq(4L),
      "one checkpoint at the strictly newer key — the superseded one " +
        "is swept only after the superset landed")
    assert(SwitchLog.historyReqs(spark, root) == (1L to 5L))
    assert(SwitchLog.pointerAsOf(spark, root, 21L).contains((2L, 20L)) &&
      SwitchLog.pointerAsOf(spark, root, 99L).contains((5L, 50L)))
  }

  test("crash window B: a superseded archive checkpoint survives — " +
      "readers union + dedup, and the next call consolidates to one") {
    val root = freshRoot("archcrash")
    // hand-build the window: checkpoint upto=1 written, records 2..3
    // live, then an archival that wrote upto=2 but died before
    // sweeping upto=1
    plantRecord(s"$root/archive", 1L, 10L, 11L)
    new java.io.File(s"$root/archive/req=1")
      .renameTo(new java.io.File(s"$root/archive/upto=1"))
    for (r <- 2L to 3L) SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    assert(SwitchLog.archive(spark, root, keep = 1) == 1L,
      "records 2 is archived; the union carries upto=1's content too")
    assert(SwitchLog.archives(spark, root) == Seq(2L),
      "the superseded checkpoint is swept once the superset landed")
    assert(SwitchLog.historyReqs(spark, root) == Seq(1L, 2L, 3L))
    assert(SwitchLog.pointerAsOf(spark, root, 21L).contains((2L, 20L)))
    assert(SwitchLog.pointerAsOf(spark, root, 11L).contains((1L, 10L)),
      "facts that only ever lived in the older checkpoint survive " +
        "consolidation")
  }

  test("q94 end-to-end: four cycles through the real FoldMachine — " +
      "listings bounded after every trigger, scaffolding gone at the " +
      "end, and time travel through ARCHIVED history exact") {
    val sf = "/root/testdata/sf0.001"
    val row = StreamOps.indexSwitchArchive(spark, sf).collect()(0)
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val nBase = emb.filter(!pmod(col("vec_id"), lit(10)).isin(8, 9)).count()
    val nClean = emb.filter(pmod(col("vec_id"), lit(10)) === 8).count()
    val nFirst2 = emb.filter(pmod(col("vec_id"), lit(10)) === 8 &&
      pmod(col("vec_id"), lit(90)).isin(8, 18)).count()
    assert(row.getAs[Long]("n_triggers") == 9)
    assert(row.getAs[Long]("n_adoptions") == 4)
    assert(row.getAs[Boolean]("history_complete"),
      "archive ∪ live must be exactly the four adopted reqs {1,3,5,7}")
    assert(row.getAs[Long]("n_archived") == 3,
      "keep=1: three closed records consolidated")
    assert(row.getAs[Boolean]("live_switch_bounded"),
      "never more than keep live switch dirs after any trigger")
    assert(row.getAs[Boolean]("scaffolding_bounded"),
      "request/fold-request dirs O(current cycle) throughout, 0 at end")
    assert(row.getAs[Boolean]("quiet_reads_bounded"),
      "quiet triggers still read at most one switch record")
    assert(row.getAs[Boolean]("adopt_reads_bounded"),
      "adopting triggers pay pointer + amortized-O(1) archival reads")
    assert(row.getAs[Boolean]("audit_reads_bounded"),
      "as-of through the archive: ≤ 2 record-read jobs regardless of " +
        "adoption count")
    assert(row.getAs[Long]("n_asof_2") == nBase + nFirst2)
    assert(row.getAs[Boolean]("asof_2_exact") &&
      row.getAs[Boolean]("asof_2_on_first_retrain"),
      "the as-of answer lives in the ARCHIVE and reconstructs " +
        "row-identically under the archived pointer's persisted models")
    assert(row.getAs[Long]("n_asof_9") == nBase + nClean)
    assert(row.getAs[Boolean]("asof_9_exact") &&
      row.getAs[Boolean]("asof_9_on_third_retrain"))
    assert(row.getAs[Long]("n_index") == nBase + nClean)
    assert(row.getAs[Boolean]("ids_unique"))
    assert(row.getAs[Boolean]("serving_exact"),
      "final serving (snapshot ∪ folded residual) row-identical to " +
        "the one-shot re-encode")
    assert(row.getAs[Long]("n_results") == 10)
  }

  test("skip branch converges too: a crash after the checkpoint write " +
      "but before ANY sweep leaves a superseded checkpoint plus live " +
      "leftovers, and the next archival sweeps both without rewriting") {
    val root = freshRoot("skipconv")
    for (r <- 1L to 5L) SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    assert(SwitchLog.archive(spark, root, keep = 1) == 4L) // upto=4
    // the crash window: superseded checkpoint not swept, two archived
    // records' live dirs not swept
    plantRecord(s"$root/archive", 1L, 10L, 11L)
    new java.io.File(s"$root/archive/req=1")
      .renameTo(new java.io.File(s"$root/archive/upto=2"))
    plantRecord(root, 3L, 30L, 31L)
    plantRecord(root, 4L, 40L, 41L)
    // toArchive = {3, 4}, max == existing checkpoint key → the skip
    // branch: no write (rewriting upto=4 in place would derive the
    // replacement from the file being deleted), but BOTH interrupted
    // sweep families finish — without the checkpoint sweep the stale
    // upto=2 would double every archive read until some later cycle
    // happened to advance the key
    assert(SwitchLog.archive(spark, root, keep = 1) == 2L)
    assert(SwitchLog.adopted(spark, root) == Seq(5L))
    assert(SwitchLog.archives(spark, root) == Seq(4L),
      "the superseded checkpoint is swept by the skip branch")
    assert(SwitchLog.historyReqs(spark, root) == (1L to 5L))
  }

  test("keep must be >= 1: the newest record stays live") {
    val root = freshRoot("keep")
    SwitchLog.write(spark, root, 1L, 10L, 11L)
    val ex = intercept[IllegalArgumentException](
      SwitchLog.archive(spark, root, keep = 0))
    assert(ex.getMessage.contains("newest switch record must stay live"))
  }
}
