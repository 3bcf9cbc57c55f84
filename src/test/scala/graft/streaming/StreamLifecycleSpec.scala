package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full streamed lifecycle (q88): adds + deletes in one stream,
  * BOTH creep families folded in-loop — code generations into a
  * tombstone-applied cell-clustered epoch, tombstone generations into
  * one id-set epoch that is never absorbed (late re-deliveries of
  * deleted ids must stay dead). The row carries the contracts; this
  * spec names them, checks the physical directory bounds on disk, and
  * drives the k=2 shape (fold on every add trigger — the most
  * fold-churned schedule, where an ordering bug between the fold's
  * tombstone pre-apply and the tombstone epoch's survival would
  * surface).
  */
class StreamLifecycleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dirCount(idx: String, sub: String, prefix: String): Int =
    Option(new java.io.File(s"$idx/$sub").listFiles()).toSeq.flatten
      .count(_.getName.startsWith(prefix))

  private def nLive: Long = graft.Tables.load(spark, sf, "embeddings")
    .filter(col("vec_id") =!= 0)
    .filter(pmod(col("vec_id"), lit(10)) === 9 ||
      pmod(col("vec_id"), lit(7)) =!= 3)
    .count()

  test("default k=3: both families bounded at every trigger, redelivered " +
      "deleted ids stay dead through the folds, serving = one-shot") {
    val row = StreamOps.streamIndexLifecycle(spark, sf).collect()(0)
    assert(row.getLong(0) == 8, "8 triggers (3 adds, 3 dels, 2 adds)")
    assert(row.getLong(1) == 2, "code folds at triggers 2 and 7")
    assert(row.getLong(2) == 1, "tombstone fold at trigger 6")
    assert(row.getBoolean(3),
      "code AND tombstone directory counts must stay ≤ k at every trigger")
    assert(row.getLong(4) == nLive,
      "serving covers exactly the non-deleted corpus")
    assert(row.getBoolean(5), "no id served twice")
    assert(row.getBoolean(6),
      "serving must be row-identical to the one-shot shape over the " +
        "full delivery history — including the re-delivered deleted " +
        "ids staying dead (the tombstone epoch survived the code folds)")
    assert(row.getBoolean(7),
      "the unfolded generation must still physically carry the dead " +
        "re-delivered rows — only the serving anti-join hides them, " +
        "and forgetting IT fails the one-shot equality")
    assert(row.getLong(8) == 10)
    val idx = graft.RunPaths.scratch(
      s"graft_q88_index_${graft.RunPaths.keyFor(sf)}_3")
    assert(dirCount(idx, "codes", "gen=") +
      dirCount(idx, "compact", "epoch=") <= 3, "code dirs bounded on disk")
    assert(dirCount(idx, "tombs", "gen=") +
      dirCount(idx, "tepoch", "epoch=") <= 3, "tombstone dirs bounded on disk")
    assert(dirCount(idx, "tepoch", "epoch=") == 1,
      "exactly one tombstone epoch remains — folded but NOT absorbed")
  }

  test("k=2 folds on every add trigger: maximal churn, same guarantees") {
    val row = StreamOps.streamIndexLifecycle(spark, sf, k = 2).collect()(0)
    assert(row.getLong(0) == 8)
    assert(row.getLong(1) == 5,
      "k=2: every add trigger reaches the bound (t1,t2,t3,t7,t8)")
    assert(row.getLong(2) == 2, "tombstone folds at t5 and t6")
    assert(row.getBoolean(3))
    assert(row.getLong(4) == nLive)
    assert(row.getBoolean(5))
    assert(row.getBoolean(6),
      "per-trigger folding with tombstone pre-apply still equals the " +
        "one-shot shape")
    assert(!row.getBoolean(7),
      "k=2's trailing fold covers the redelivery generation, so the " +
        "dead rows are legitimately GONE from storage — the physical " +
        "carry flag must flip, proving it measures storage, not the " +
        "anti-join")
    assert(row.getLong(8) == 10)
  }

  test("q91 horizon purge: aged+physically-absent tombstones leave the " +
      "epoch; a still-tombstoned re-delivery stays dead; a purged " +
      "re-delivery resurfaces (the documented at-your-own-risk case)") {
    val row = StreamOps.streamIndexLifecyclePurge(spark, sf).collect()(0)
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val d12 = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9 &&
      pmod(col("vec_id"), lit(21)).isin(3, 10)).count()
    val d3 = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9 &&
      pmod(col("vec_id"), lit(21)) === 17).count()
    val redelivD1 = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9 &&
      pmod(col("vec_id"), lit(42)) === 3).count()
    assert(row.getLong(0) == 8, "8 triggers")
    assert(row.getLong(1) == 2, "code folds at t2 and t6")
    assert(row.getLong(2) == 1, "tombstone fold (with purge) at t7")
    assert(row.getBoolean(3), "both families ≤ k at every trigger")
    assert(row.getLong(4) == d12 && d12 > 0,
      "the purge drops exactly D1∪D2 — aged past the horizon AND " +
        "physically removed by the t6 code fold; D3 (inside the " +
        "horizon) must survive on age, and nothing may purge on age " +
        "alone while its rows are still stored")
    assert(row.getLong(5) == d3,
      "the epoch shrinks to exactly the surviving tombstones")
    assert(row.getLong(6) ==
      emb.filter(pmod(col("vec_id"), lit(10)) === 9 ||
        pmod(col("vec_id"), lit(7)) =!= 3).count() + redelivD1,
      "live = non-deleted corpus + the resurfaced purged re-delivery")
    assert(row.getBoolean(7), "no id served twice")
    assert(row.getBoolean(8),
      "serving row-identical to the closed-form expected live set")
    assert(row.getBoolean(9),
      "a re-delivery of a STILL-TOMBSTONED id (deleted inside the " +
        "horizon) stays dead through the purge")
    assert(row.getBoolean(10) && redelivD1 > 0,
      "a re-delivery of a PURGED id resurfaces — the at-your-own-risk " +
        "contract is real and visible, not prose")
    assert(row.getBoolean(11),
      "gen 8 is unfolded: the stored codes physically carry both " +
        "re-delivered halves; only the anti-join hides the dead one")
    assert(row.getLong(12) == 10)
    val idx = graft.RunPaths.scratch(
      s"graft_q91_index_${graft.RunPaths.keyFor(sf)}_3")
    assert(dirCount(idx, "tepoch", "epoch=") == 1 &&
      dirCount(idx, "tombs", "gen=") == 0,
      "one purged tombstone epoch remains on disk")
  }

  test("q92 advancing horizon across TWO purges: the epoch stays " +
      "bounded per-fold, a re-deleted id's restarted clock survives " +
      "the first purge and qualifies at the second, and the carry " +
      "condition stays load-bearing late") {
    val row = StreamOps.streamIndexLifecycleMultiPurge(spark, sf)
      .collect()(0)
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    def baseCnt(c: org.apache.spark.sql.Column): Long =
      emb.filter(pmod(col("vec_id"), lit(10)) =!= 9 && c).count()
    val d1Rest = baseCnt(pmod(col("vec_id"), lit(42)) === 24)
    val d2 = baseCnt(pmod(col("vec_id"), lit(21)) === 10)
    val d3 = baseCnt(pmod(col("vec_id"), lit(21)) === 17)
    val r = baseCnt(pmod(col("vec_id"), lit(42)) === 3)
    assert(row.getAs[Long]("n_triggers") == 10)
    assert(row.getAs[Long]("code_folds") == 2, "code folds at t4 and t7")
    assert(row.getAs[Long]("tomb_folds") == 2,
      "tombstone folds (purges) at t5 and t9")
    assert(row.getAs[Boolean]("both_bounded"),
      "both families ≤ k at every trigger, across BOTH purges")
    assert(row.getAs[Boolean]("horizons_advanced"),
      "the second purge ran against a strictly fresher horizon — the " +
        "production watermark shape, not q91's constant")
    assert(row.getAs[Long]("n_purged_1") == d1Rest + d2 && d1Rest > 0,
      "purge 1 drops exactly D1∖R and D2: R was re-deleted just before " +
        "the fold, so its RESTARTED clock (newest delete wins) keeps it " +
        "inside the horizon — under oldest-wins it would purge here")
    assert(row.getAs[Long]("n_purged_2") == r && r > 0,
      "purge 2 drops exactly R: the advanced horizon passed its " +
        "restarted clock, and its rows are physically absent. D3 ages " +
        "inside horizon 2 but is still CARRIED (deleted after the last " +
        "code fold) — purging it would resurrect stored rows")
    assert(row.getAs[Long]("tomb_epoch_rows") == d3 + d2,
      "the epoch after purge 2 holds exactly the survivors — bounded " +
        "per-fold, never cumulative history")
    assert(row.getAs[Boolean]("ids_unique"))
    assert(row.getAs[Boolean]("lifecycle_invisible"),
      "serving row-identical to the closed-form live set")
    assert(row.getAs[Boolean]("inside_horizon_redelivery_dead"),
      "the re-delivered D3 half stays dead — still tombstoned")
    assert(row.getAs[Boolean]("purged_redelivery_resurfaces"),
      "the re-delivered R resurfaces — purged at fold 2, which also " +
        "proves it SURVIVED fold 1 (a tombstoned id cannot resurface)")
    assert(row.getAs[Boolean]("raw_carries_redelivered"))
    assert(row.getAs[Long]("n_results") == 10)
    val idx = graft.RunPaths.scratch(
      s"graft_q92_index_${graft.RunPaths.keyFor(sf)}_3")
    assert(dirCount(idx, "tepoch", "epoch=") == 1 &&
      dirCount(idx, "tombs", "gen=") == 0 &&
      dirCount(idx, "tmanifest", "epoch=") == 2,
      "one surviving tombstone epoch + both 1-row purge manifests on disk")
  }
}
