package graft.tools

/** Quantifies the r13 lead fix (SwitchLog): per-trigger cost of the
  * serving-pointer derivation as switch history grows. Plants N
  * overwrite-keyed switch records (one per retrain a long-lived stream
  * ever adopted), then times
  *
  *   - the OLD shape — read `folded_through` from EVERY record, the
  *     `switches()` q86/q90 shipped before round 14 (one 1-row Spark
  *     job per historical retrain, per call), and
  *   - the NEW shape — [[graft.streaming.SwitchLog.pointer]]: the
  *     directory listing plus ONE 1-row read of the max record,
  *
  * at several history depths. The old shape grows linearly with the
  * stream's lifetime; the new one is flat — that difference, times 3–4
  * calls per trigger, times one trigger per micro-batch, is what the
  * fix removes from a month-long stream's synchronous path.
  *
  * Usage: runMain graft.tools.SwitchHistoryRehearsal
  */
object SwitchHistoryRehearsal {

  def main(args: Array[String]): Unit = {
    import graft.streaming.SwitchLog
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val root = graft.RunPaths.scratch("graft_switch_history") + "/switch"
    val depths = Seq(10, 40, 120)
    val reps = 5

    def timeMs(body: => Unit): Double = {
      body // one untimed warm pass
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      (System.nanoTime() - t0) / 1e6 / reps
    }

    var planted = 0
    val rows = depths.map { n =>
      (planted + 1 to n).foreach(r =>
        SwitchLog.write(spark, root, r, r * 10L, r * 10L + 1))
      planted = n
      // the pre-round-14 derivation: one 1-row read PER record
      val oldMs = timeMs {
        SwitchLog.adopted(spark, root)
          .foreach(r => SwitchLog.foldedThrough(spark, root, r))
      }
      // the shipped derivation: listing + ONE read of the max record
      val newMs = timeMs {
        assert(SwitchLog.pointer(spark, root).exists(_._1 == n.toLong))
      }
      System.err.println(
        f"[switch-history] n=$n%4d old=${oldMs}%9.1f ms/call new=${newMs}%7.1f ms/call")
      s"""{"switches":$n,"full_history_ms":${oldMs.round},"pointer_ms":${newMs.round}}"""
    }
    println(s"""{"metric":"switch_history_pointer_ms","reps":$reps,""" +
      s""""rows":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
