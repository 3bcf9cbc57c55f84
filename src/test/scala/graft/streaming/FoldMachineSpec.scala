package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The canonical fold/adopt state machine (FoldMachine) and the
  * switch-log pointer (SwitchLog), driven against SYNTHETIC durable
  * state — the cases the q90 delivery harness cannot reach:
  *
  *   - O(1)-in-history pointer derivation with ≥ 3 historical switch
  *     records (the r13 lead finding: adopted-set membership must be a
  *     listing, the pointer exactly ONE record read);
  *   - a stale fold request lingering from a PREVIOUS retrain cycle
  *     must not drag sealed_from under the new retrain's snapshot
  *     boundary (ADVICE r13: duplicate vec_ids in serving otherwise);
  *   - a maintenance-pass-submitted FIRST fold request must cap its
  *     delivery gate at an EXISTING log generation (ADVICE r13: gating
  *     on a row that will never be written hangs the worker 300 s and
  *     swallows the failure in a daemon thread).
  */
class FoldMachineSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"foldmachine_$tag").toString

  private lazy val slices: org.apache.spark.sql.DataFrame =
    graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))

  /** A retrain the machine can observe: durable request record, a real
    * trained model layout (the fold worker re-encodes under it), and
    * the done marker. */
  private def plantRetrain(h: Handoff, idx: String, req: Long): Unit = {
    h.submitRecord(req, spark.range(1).select(lit(req).as("gen")))
    graft.queries.LlmOps.buildFrozenIndex(spark, sf,
      slices.filter(pmod(col("vec_id"), lit(10)) =!= 9),
      s"$idx/retrain/req=$req", "foldmachine spec retrained table",
      withOccupancy = false)
    val m = new java.io.File(s"$idx/retrain/req=$req/_RETRAIN_DONE")
    m.getParentFile.mkdirs()
    m.createNewFile()
    ()
  }

  private def plantRaw(idx: String, gen: Long, residue: Int): Unit =
    slices.filter(pmod(col("vec_id"), lit(30)) === residue)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$idx/arrived/gen=$gen")

  private def mkRetrainH(idx: String): Handoff =
    new Handoff(spark, s"$idx/req",
      g => s"$idx/retrain/req=$g/_RETRAIN_DONE", "fm-spec-retrain")(
      (_, _) => fail("the spec plants retrains; no worker may run"))

  test("SwitchLog: with 3+ historical switches the adopted set is a " +
      "listing (0 record reads) and the pointer exactly ONE record " +
      "read — O(1) in switch history") {
    val root = s"${freshIdx("switchlog")}/switch"
    for (r <- Seq(1L, 2L, 3L))
      SwitchLog.write(spark, root, r, r * 10, r * 10 + 1)
    val reads0 = SwitchLog.recordReads(root)
    assert(SwitchLog.adopted(spark, root) == Seq(1L, 2L, 3L))
    assert(SwitchLog.recordReads(root) == reads0,
      "adopted-set membership must not read records — request ids ARE " +
        "the directory names")
    assert(SwitchLog.pointer(spark, root).contains((3L, 30L)),
      "the pointer is the MAX record's folded_through")
    assert(SwitchLog.recordReads(root) == reads0 + 1,
      "the pointer costs exactly one 1-row read no matter how many " +
        "retrains the stream has ever adopted")
  }

  test("a stale fold request from a previous retrain cycle never drags " +
      "sealed_from under the new retrain's snapshot boundary") {
    val idx = freshIdx("stale")
    val retrainH = mkRetrainH(idx)
    val fm = new FoldMachine(spark, idx, retrainH, "fm-spec-fold",
      "foldmachine spec frozen table", gated = false)
    // cycle 1, already finished: retrain req=2 adopted (switch record),
    // and its fold request req=4 still on disk — the close-cycle sweep
    // normally removes it at adoption, so this is the CRASH WINDOW
    // (adoption's switch write landed, the sweep died) the seal guard
    // exists for
    val m2 = new java.io.File(s"$idx/retrain/req=2/_RETRAIN_DONE")
    m2.getParentFile.mkdirs(); m2.createNewFile()
    retrainH.submitRecord(2L, spark.range(1).select(lit(2L).as("gen")))
    SwitchLog.write(spark, s"$idx/switch", 2L, 4L, 5L)
    fm.foldH.submitRecord(4L, spark.range(1)
      .select(lit(4L).as("req_gen"), lit(2L).as("retrain_req"),
        lit(2L).as("sealed_from"), lit(4L).as("sealed_to"),
        lit(4L).as("gate_gen")))
    val m4 = new java.io.File(s"$idx/fold_req/req=4/_FOLD_DONE")
    m4.getParentFile.mkdirs(); m4.createNewFile()
    // cycle 2: a NEW completed retrain whose snapshot covers gens ≤ 5
    (1L to 5L).foreach(g => new java.io.File(s"$idx/arrived/gen=$g").mkdirs())
    plantRaw(idx, 6L, residue = 18)
    plantRaw(idx, 7L, residue = 28)
    plantRetrain(retrainH, idx, 5L)
    // the observing trigger: the seal must start at the retrain's own
    // boundary (5), not at the stale cycle-1 request (4) — sealing
    // (4, 7] would re-encode gen 5, which the snapshot already carries
    val (requested, inflight, adopted) = fm.maintain(7L)
    assert(requested && !inflight && !adopted)
    val rec = fm.foldH.record(7L)
    assert(rec.getAs[Long]("sealed_from") == 5L,
      "sealed_from = max(retrain req, newest fold req): a stale " +
        "cycle-1 request must not pull the seal under the snapshot " +
        "boundary (duplicate vec_ids in serving)")
    assert(rec.getAs[Long]("sealed_to") == 7L)
    fm.foldH.joinAll()
    assert(StreamOps.genDirs(spark, s"$idx/retrain/req=5/fold", "gen=") ==
      Seq(6L, 7L),
      "the fold re-encodes exactly the residual gap — nothing the " +
        "snapshot already encodes")
    // next observation adopts: covered range reaches the doorstep
    val (_, _, adopted2) = fm.maintain(8L)
    assert(adopted2 && fm.pointer("base") == (s"$idx/retrain/req=5", 7L))
  }

  test("adoption closes the cycle: request and fold-request " +
      "scaffolding swept, in-JVM bookkeeping forgotten, and the switch " +
      "log archived — listings stay O(current cycle), history stays " +
      "complete and audit-exact through the archive") {
    val idx = freshIdx("closecycle")
    val retrainH = mkRetrainH(idx)
    val fm = new FoldMachine(spark, idx, retrainH, "fm-spec-close",
      "foldmachine spec frozen table", gated = false, keepSwitches = 1)
    // cycle 1: retrain req=2 done over raws ≤ 2, adopted at gen 3
    (1L to 2L).foreach(g => new java.io.File(s"$idx/arrived/gen=$g").mkdirs())
    plantRetrain(retrainH, idx, 2L)
    val (_, _, a1) = fm.maintain(3L)
    assert(a1)
    assert(retrainH.requests().isEmpty,
      "the adopted retrain's request record is subsumed by the switch " +
        "record and swept at adoption")
    assert(SwitchLog.adopted(spark, s"$idx/switch") == Seq(2L) &&
      SwitchLog.archives(spark, s"$idx/switch").isEmpty,
      "one live record stays under keep=1 — no archive yet")
    // cycle 2: a new retrain req=5 with a real residual gap {6, 7}
    // (so a fold request is LAUNCHED, not planted), plus a DONE
    // cycle-1-shaped fold request left behind (the sweep crash
    // window): adoption must sweep both and archive cycle 1's switch
    (3L to 5L).foreach(g => new java.io.File(s"$idx/arrived/gen=$g").mkdirs())
    plantRaw(idx, 6L, residue = 18)
    plantRaw(idx, 7L, residue = 28)
    plantRetrain(retrainH, idx, 5L)
    fm.foldH.submitRecord(4L, spark.range(1)
      .select(lit(4L).as("req_gen"), lit(2L).as("retrain_req"),
        lit(2L).as("sealed_from"), lit(4L).as("sealed_to"),
        lit(0L).as("gate_gen")))
    val m4 = new java.io.File(s"$idx/fold_req/req=4/_FOLD_DONE")
    m4.getParentFile.mkdirs(); m4.createNewFile()
    val (req2, _, _) = fm.maintain(7L)
    assert(req2, "covered = max(rr=5, stale fold 4) = 5 < 6 — seal " +
      "(5, 7]; the stale request must not drag the seal under 5")
    assert(fm.foldH.record(7L).getAs[Long]("sealed_from") == 5L)
    // wait for the worker's marker WITHOUT joinAll: in the real loop
    // the adopting trigger runs with no intervening join, so the
    // launch entry is still held when close-cycle runs — the exact
    // state the explicit forget exists for (the sweep deletes the
    // done marker with its directory, after which prune() could never
    // drop the entry and a long stream would leak one per fold)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!fm.foldH.isDone(7L)) {
      assert(System.nanoTime() < deadline, "fold worker hung")
      Thread.sleep(50)
    }
    assert(fm.foldH.bookkeepingSizes._2 == 1,
      "precondition: the launch entry is held going into adoption")
    val (_, _, a2) = fm.maintain(8L)
    assert(a2, "covered = max(5, fold 7) = 7 ≥ 7 — adopt")
    assert(retrainH.requests().isEmpty && fm.foldH.requests().isEmpty,
      "close-cycle sweeps BOTH scaffolding families")
    assert(fm.foldH.bookkeepingSizes._2 == 0,
      "the swept fold request's launch entry is forgotten explicitly")
    fm.joinAll()
    val sroot = s"$idx/switch"
    assert(SwitchLog.adopted(spark, sroot) == Seq(5L) &&
      SwitchLog.archives(spark, sroot) == Seq(2L),
      "keep=1: cycle 1's record moved into the consolidated archive")
    assert(SwitchLog.historyReqs(spark, sroot) == Seq(2L, 5L),
      "the full adopted history stays visible through the archive")
    assert(fm.pointer("base") == (s"$idx/retrain/req=5", 7L))
    assert(StreamOps.genDirs(spark, s"$idx/retrain/req=5/fold", "gen=") ==
      Seq(6L, 7L),
      "the fold ARTIFACTS survive the scaffolding sweep — serving and " +
        "time travel read them")
    // the audit path answers from ARCHIVED history, exactly, and in
    // one archive job (+ live reads that short-circuit immediately)
    val reads0 = SwitchLog.recordReads(sroot)
    assert(SwitchLog.pointerAsOf(spark, sroot, 4L).contains((2L, 2L)),
      "as-of gen 4 resolves to the archived cycle-1 switch")
    assert(SwitchLog.recordReads(sroot) - reads0 <= 2,
      "audit reads are O(keep) + one archive job, no longer " +
        "O(adoptions)")
  }

  test("a maintenance-pass-submitted FIRST fold request caps its gate " +
      "at an existing log generation; joined and re-maintained, it " +
      "completes and adopts instead of hanging a daemon worker") {
    val idx = freshIdx("gatecap")
    val retrainH = mkRetrainH(idx)
    val fm = new FoldMachine(spark, idx, retrainH, "fm-spec-fold2",
      "foldmachine spec frozen table") // gated = true: the capped path
    (1L to 2L).foreach(g => new java.io.File(s"$idx/arrived/gen=$g").mkdirs())
    plantRaw(idx, 3L, residue = 18)
    plantRaw(idx, 4L, residue = 28)
    // the triggers' log rows exist for gens 1..4 and never will for 5
    (1L to 4L).foreach(g => spark.range(1).select(lit(g).as("gen"))
      .write.mode("overwrite").parquet(s"$idx/log/gen=$g"))
    plantRetrain(retrainH, idx, 2L)
    // the stream has ended; only the maintenance pass observes the
    // retrain. atGen = maxGen + 1 = 5: the uncapped gate would be
    // sealTo + 1 = 5 — a log row that will never be written
    val (requested, _, _) = fm.maintain(5L)
    assert(requested)
    assert(fm.foldH.record(4L).getAs[Long]("gate_gen") == 4L,
      "the gate caps at the newest EXISTING log generation — gating " +
        "on gen 5 would spin the worker 300 s against a row nobody " +
        "will write")
    fm.foldH.joinAll() // completes promptly: gen 4's _SUCCESS exists
    val (_, _, adopted) = fm.maintain(5L)
    assert(adopted, "join + re-maintain adopts the maintenance fold")
    assert(fm.pointer("base") == (s"$idx/retrain/req=2", 4L))
    assert(StreamOps.genDirs(spark, s"$idx/retrain/req=2/fold", "gen=") ==
      Seq(3L, 4L))
  }

  test("a maintenance pass with NO log rows at all writes gate_gen=0 " +
      "and the gated worker treats that as NO gate — not a 300s wait " +
      "on a generation nobody will write") {
    val idx = freshIdx("nogate")
    val retrainH = mkRetrainH(idx)
    val fm = new FoldMachine(spark, idx, retrainH, "fm-spec-fold3",
      "foldmachine spec frozen table") // gated = true
    plantRaw(idx, 1L, residue = 18)
    plantRaw(idx, 2L, residue = 28)
    plantRetrain(retrainH, idx, 1L)
    // no log/ directory exists: the cap has nothing to gate on
    val (requested, _, _) = fm.maintain(3L)
    assert(requested)
    assert(fm.foldH.record(2L).getAs[Long]("gate_gen") == 0L)
    fm.foldH.joinAll() // must complete promptly — 0 means no gate
    val (_, _, adopted) = fm.maintain(3L)
    assert(adopted &&
      StreamOps.genDirs(spark, s"$idx/retrain/req=1/fold", "gen=") == Seq(2L))
  }

  test("restart shape: a fold request from a dead driver (record, no " +
      "marker, no worker) is re-armed, its residual sealed, and " +
      "adopted by the loop-until-quiet maintenance belt") {
    val idx = freshIdx("restart")
    val retrainH = mkRetrainH(idx)
    val fm = new FoldMachine(spark, idx, retrainH, "fm-spec-fold4",
      "foldmachine spec frozen table", gated = false)
    (1L to 2L).foreach(g => new java.io.File(s"$idx/arrived/gen=$g").mkdirs())
    plantRaw(idx, 3L, residue = 8)
    plantRaw(idx, 4L, residue = 18)
    plantRaw(idx, 5L, residue = 28)
    plantRetrain(retrainH, idx, 2L)
    // the dead driver's state: fold request sealing (2,4] durable,
    // worker never started, stream over at gen 5 — so after the
    // re-armed fold lands there is STILL a residual {5} to seal
    fm.foldH.submitRecord(4L, spark.range(1)
      .select(lit(4L).as("req_gen"), lit(2L).as("retrain_req"),
        lit(2L).as("sealed_from"), lit(4L).as("sealed_to"),
        lit(0L).as("gate_gen")))
    // the q90 teardown belt: loop join+maintain until quiet — a fixed
    // two rounds would leave the resealed residual un-adopted
    var quiet = false
    var rounds = 0
    var sawInflight = false
    var sawRequested = false
    while (!quiet && rounds < 8) {
      fm.joinAll()
      val (req, inflight, adopted) = fm.maintain(6L)
      sawInflight ||= inflight
      sawRequested ||= req
      quiet = !req && !inflight && !adopted
      rounds += 1
    }
    fm.joinAll()
    assert(sawInflight, "round 1 re-arms the dead driver's fold")
    assert(sawRequested, "a later round seals the residual {5}")
    assert(fm.adopted() == Seq(2L) &&
      fm.pointer("base") == (s"$idx/retrain/req=2", 5L),
      "the belt adopts with folded_through at the newest raw")
    assert(StreamOps.genDirs(spark, s"$idx/retrain/req=2/fold", "gen=") ==
      Seq(3L, 4L, 5L),
      "both the re-armed fold and the residual fold landed")
  }
}
