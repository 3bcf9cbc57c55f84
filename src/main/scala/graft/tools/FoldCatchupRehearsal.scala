package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer.HouseM

/** The catch-up recursion under SUSTAINED pressure, measured (VERDICT
  * r13 task 4): q90's geometric-shrink claim — "the residual shrinks
  * whenever folds outpace arrivals" — is proven mechanically by the
  * 8-trigger spec but the spec's folds are gated, not slow. This
  * rehearsal drives the REAL machinery (FoldMachine + Handoff, the
  * exact q90 code path, gates off = the production shape) with
  *
  *   - triggers arriving on a fixed period T (the loop pads each
  *     trigger body to T), and
  *   - the fold worker deliberately slowed to a per-generation cost c
  *     chosen so a single fold spans SEVERAL trigger periods,
  *
  * at fold-throughput : arrival-rate ratios T/c ≈ 2 and ≈ 3. A retrain
  * completes only after `doneAt` generations have arrived, leaving an
  * initial residual of doneAt−2 gap generations; every later trigger
  * runs `maintain` exactly as q90's do. The durable fold requests ARE
  * the measurement: each seals (prev, own gen], so the per-request
  * seal sizes are the residual series, and the switch record dates the
  * adoption.
  *
  * Expected (and what the r13 SCALING table records): the residual
  * series decreases round over round — r_{k+1} ≈ r_k·c/T + 1 — until a
  * fold completes within one trigger period, at which point the next
  * trigger ADOPTS with one switch write. If arrivals outpace the fold
  * (T/c < 1) no architecture converges: the system is
  * under-provisioned, which is the honest boundary of the claim.
  *
  * Usage: runMain graft.tools.FoldCatchupRehearsal <sfDir>
  */
object FoldCatchupRehearsal {

  private case class Config(triggerMs: Long, foldSleepMs: Long)
  private case class Result(
      triggerMs: Long, foldSleepMs: Long, measuredRatio: Double,
      residuals: Seq[Long], triggersToAdoption: Long, adopted: Boolean)

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println(
        "usage: graft.tools.FoldCatchupRehearsal <sfDir>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    // Three points (c also carries the real re-encode cost — ~550 ms
    // per generation at sf0.1 on this rig — so the MEASURED ratio is
    // reported from the fold walls, not assumed): two converging runs
    // at T/c in the 2–3 band, and one deliberately AT the boundary.
    // The boundary is real: the steady-state residual is ~2 (the
    // observing trigger's own gen is always in the seal), and a 2-gen
    // fold adopts only if 2c ≤ T — below ratio 2 the series plateaus
    // at 2 without adopting, which is the honest convergence edge
    // (and below 1 nothing converges: under-provisioned)
    val results =
      Seq(Config(2400L, 800L), Config(2400L, 550L), Config(2400L, 250L))
        .zipWithIndex.map { case (cfg, i) => run(spark, sfDir, cfg, i) }

    def fmt(r: Result): String =
      s"""{"trigger_ms":${r.triggerMs},"fold_sleep_ms":${r.foldSleepMs},""" +
        s""""measured_ratio":${f"${r.measuredRatio}%.2f"},""" +
        s""""residuals":${r.residuals.mkString("[", ",", "]")},""" +
        s""""triggers_to_adoption":${r.triggersToAdoption},""" +
        s""""adopted":${r.adopted}}"""
    results.foreach(r => System.err.println(
      f"[catchup] T=${r.triggerMs}ms c*=${r.foldSleepMs}ms " +
        f"ratio=${r.measuredRatio}%.2f residuals=${r.residuals.mkString(",")} " +
        f"adopted=${r.adopted} after ${r.triggersToAdoption} triggers"))
    println(s"""{"metric":"fold_catchup","sf":${graft.JsonText.quote(sfDir)},""" +
      s""""configs":${results.map(fmt).mkString("[", ",", "]")}}""")
    spark.stop()
  }

  private def run(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      cfg: Config, tag: Int): Result = {
    import graft.streaming.{FoldMachine, Handoff, StreamOps}
    val nGens = 24
    val doneAt = 7L // retrain lands after gen 7 → initial residual 5
    val all = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(pmod(col("vec_id"), lit(10)) =!= 8)
    val clean = all.filter(pmod(col("vec_id"), lit(10)) === 8)
    val idx = graft.RunPaths.scratch(
      s"graft_catchup_${graft.RunPaths.keyFor(sfDir)}_$tag")
    val mDir = s"$idx/model"

    val retrainH = new Handoff(spark, s"$idx/req",
      g => s"$idx/retrain/req=$g/_RETRAIN_DONE", s"catchup-retrain-$tag")(
      (_, _) => throw new IllegalStateException(
        "the rehearsal plants the retrain; no worker may run"))
    val fm = new FoldMachine(spark, idx, retrainH, s"catchup-fold-$tag",
      "catchup rehearsal frozen table", gated = false,
      foldSleepMsPerGen = cfg.foldSleepMs)

    // untimed setup: base model + the retrained model the fold encodes
    // under (training itself is q86/q90's measured story, not this one)
    graft.queries.LlmOps.buildFrozenIndex(spark, sfDir, base, mDir,
      "catchup rehearsal frozen table", withOccupancy = false)
    graft.queries.LlmOps.buildFrozenIndex(spark, sfDir, base, s"$idx/retrain/req=2",
      "catchup rehearsal retrained table", withOccupancy = false)
    retrainH.submitRecord(2L, spark.range(1).select(lit(2L).as("gen")))

    // seals and fold walls are collected INCREMENTALLY: the adopting
    // trigger's close-cycle step (q94) sweeps the fold requests and
    // their done markers, so a post-loop read of durable state would
    // come up empty — each request's record is read when it is
    // written, and each marker's timestamp polled at the next trigger
    // (before maintain, which may sweep it) and once after the final
    // join for the never-adopted boundary run
    val submitAt = scala.collection.mutable.Map.empty[Long, Long]
    val seals = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val doneAtMs = scala.collection.mutable.Map.empty[Long, Long]
    def pollDone(): Unit = seals.foreach { case (r, _, _) =>
      if (!doneAtMs.contains(r)) {
        val done = new java.io.File(s"$idx/fold_req/req=$r/_FOLD_DONE")
        if (done.exists()) doneAtMs(r) = done.lastModified()
      }
    }
    var adoptedAtGen = 0L
    var gen = 0L
    while (gen < nGens && adoptedAtGen == 0L) {
      gen += 1
      val t0 = System.currentTimeMillis()
      // the trigger body, exactly q90's synchronous shape: persist raw,
      // maintain (request/re-arm/adopt), append under the pointer, log
      clean.filter(pmod(col("vec_id"), lit(10L * nGens)) === 8 + 10 * (gen - 1))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$idx/arrived/gen=$gen")
      if (gen == doneAt) {
        // the retrain "lands" now: training ran concurrently since gen
        // 2 — planted rather than timed, so the rehearsal isolates the
        // FOLD dynamics from training wall
        val m = new java.io.File(s"$idx/retrain/req=2/_RETRAIN_DONE")
        m.createNewFile()
      }
      pollDone()
      val (requested, _, adopted) = fm.maintain(gen)
      if (requested) {
        val r = fm.foldH.requests().max
        submitAt(r) = System.currentTimeMillis()
        val rec = fm.foldH.record(r)
        seals += ((r, rec.getAs[Long]("sealed_from"),
          rec.getAs[Long]("sealed_to")))
      }
      if (adopted) {
        adoptedAtGen = gen
        // a marker that appeared between this trigger's pollDone() and
        // maintain()'s own done probe was adopted and SWEPT before its
        // timestamp could be read — stamp those folds with "now", an
        // upper bound off by at most maintain's own wall (tens of ms
        // against multi-second folds), instead of silently dropping
        // the (typically final) sample from the ratio
        seals.foreach { case (r, _, _) =>
          if (!doneAtMs.contains(r))
            doneAtMs(r) = System.currentTimeMillis()
        }
      }
      val (ptr, _) = fm.pointer(mDir)
      val (coarseF, booksF) = fm.frozenModels(ptr)
      graft.operators.ProductQuantizer.ivfPqEncodeWith(
          spark.read.parquet(s"$idx/arrived/gen=$gen"),
          "vec_id", "embedding", HouseM, coarseF, booksF)
        .write.mode("overwrite").parquet(s"$idx/append/gen=$gen")
      spark.range(1).select(lit(gen).as("gen"))
        .write.mode("overwrite").parquet(s"$idx/log/gen=$gen")
      // pad the trigger period to T — the arrival clock the fold races
      val left = cfg.triggerMs - (System.currentTimeMillis() - t0)
      if (left > 0) Thread.sleep(left)
    }
    fm.joinAll()
    pollDone()

    val residuals = seals.toSeq.map { case (_, from, to) => to - from }
    val foldWalls = seals.toSeq.flatMap { case (r, from, to) =>
      for (t <- submitAt.get(r); d <- doneAtMs.get(r))
        yield (d - t).toDouble / math.max(1L, to - from)
    }
    val measuredRatio =
      if (foldWalls.isEmpty) 0.0
      else cfg.triggerMs / (foldWalls.sum / foldWalls.size)
    Result(cfg.triggerMs, cfg.foldSleepMs, measuredRatio, residuals,
      if (adoptedAtGen == 0) -1 else adoptedAtGen - doneAt,
      adoptedAtGen > 0)
  }
}
