package graft.tools

import org.apache.spark.sql.functions._

/** Per-trigger latency during a concurrent retrain (VERDICT r12 tasks
  * 4 and 6): q86's 10× wall-clock factor buries the number that
  * actually matters at 100 TB — what a single micro-batch trigger pays
  * WHILE the retrain trains concurrently in the same JVM. This
  * rehearsal runs the q86 pipeline on a `factor`× corpus blowup twice —
  * once with the Handoff maintenance pool enabled (the shipped shape:
  * FAIR scheduling, workers in "graft-maintenance") and once with the
  * pool DISABLED (workers share the triggers' default pool, so the
  * multi-minute training jobs queue head-of-line against per-second
  * trigger jobs) — and reports each phase's per-trigger wall from the
  * durable decision log the triggers already write.
  *
  * The comparison isolates scheduler-pool benefit, not FAIR-vs-FIFO
  * session config (the session is FAIR in both runs; only the
  * workers' pool assignment changes — exactly the knob Handoff owns).
  *
  * Usage: runMain graft.tools.TriggerLatencyRehearsal <srcSfDir> <factor> <blowupDir>
  */
object TriggerLatencyRehearsal {

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.tools.TriggerLatencyRehearsal " +
        "<srcSfDir> <factor> <blowupDir>")
      sys.exit(2)
    }
    val Array(src, factorS, out) = args.take(3)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    ScaleRehearsal.buildBlowup(spark, src, factor, out)

    // per-phase mean trigger wall (ms) from the durable log q86 writes;
    // "gap" is THE number — triggers appending while the retrain runs
    def run(pool: Boolean): Map[String, Double] = {
      val prev = System.getProperty("graft.handoff.pool")
      System.setProperty("graft.handoff.pool",
        if (pool) "graft-maintenance" else "")
      try {
        graft.streaming.StreamOps.streamIndexRetrainAsync(spark, out)
          .collect()
        val idx = graft.RunPaths.scratch(
          s"graft_q86_index_${graft.RunPaths.keyFor(out)}")
        spark.read.parquet(s"$idx/log")
          .groupBy(col("phase"))
          .agg(avg(col("ms")).as("ms"), count(lit(1)).as("n"))
          .collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
      } finally {
        if (prev == null) System.clearProperty("graft.handoff.pool")
        else System.setProperty("graft.handoff.pool", prev)
      }
    }

    // pool-disabled first so the shipped configuration's numbers are
    // the fresher (JIT-warmer) of the two — bias AGAINST the claim
    val noPool = run(pool = false)
    val withPool = run(pool = true)

    // the CURE, measured in the same table (r13 task 2): q90's pipeline
    // — gap fold AND adoption off the trigger — at the same blowup.
    // Reading the post row needs one decomposition: in BOTH pipelines
    // the harness's post batch is a deliberately CORPUS-SIZED fresh-id
    // copy (what keeps the PSI gate provably quiet), so the post wall
    // is dominated by that batch's own O(batch) append in q90 exactly
    // as in q86 — the adoption itself adds only ONE switch write,
    // where q86's post additionally re-encodes its whole gap inline.
    // The rows that isolate the machinery: fold-phase triggers (appends
    // WHILE the gap fold re-encodes concurrently) should sit in the
    // clean band, and q90's post should land at-or-below q86's despite
    // its folds having covered a larger gap off-trigger
    def runFold(): Map[String, Double] = {
      graft.streaming.StreamOps.streamIndexRetrainFoldAsync(spark, out)
        .collect()
      val idx = graft.RunPaths.scratch(
        s"graft_q90_index_${graft.RunPaths.keyFor(out)}")
      spark.read.parquet(s"$idx/log")
        .groupBy(col("phase"))
        .agg(avg(col("ms")).as("ms"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val fold = runFold()

    def fmt(phases: Seq[String])(m: Map[String, Double]): String =
      phases.flatMap(p =>
        m.get(p).map(v => s"${graft.JsonText.quote(p)}:${v.round}"))
        .mkString("{", ",", "}")
    val q86Phases = Seq("clean", "drift", "gap", "post")
    val q90Phases = Seq("clean", "drift", "gap", "fold", "post")
    q86Phases.foreach { p =>
      System.err.println(f"[latency] q86 $p%-6s nopool=${noPool.getOrElse(p, Double.NaN)}%8.0f ms  pool=${withPool.getOrElse(p, Double.NaN)}%8.0f ms")
    }
    q90Phases.foreach { p =>
      System.err.println(f"[latency] q90 $p%-6s pool=${fold.getOrElse(p, Double.NaN)}%8.0f ms")
    }
    println(s"""{"metric":"trigger_latency_ms","data_factor":$factor,"nopool":${fmt(q86Phases)(noPool)},"pool":${fmt(q86Phases)(withPool)},"q90":${fmt(q90Phases)(fold)},"src":${graft.JsonText.quote(src)}}""")
    spark.stop()
  }
}
