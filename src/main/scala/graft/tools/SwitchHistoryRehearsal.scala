package graft.tools

/** Quantifies the r13 lead fix (SwitchLog) and the r14 archival
  * checkpoint: per-trigger and per-audit cost of the switch log as
  * history grows. Plants N overwrite-keyed switch records (one per
  * retrain a long-lived stream ever adopted), then times
  *
  *   - the OLD trigger shape — read `folded_through` from EVERY
  *     record, the `switches()` q86/q90 shipped before round 14 (one
  *     1-row Spark job per historical retrain, per call),
  *   - the NEW trigger shape — [[graft.streaming.SwitchLog.pointer]]:
  *     the directory listing plus ONE 1-row read of the max record,
  *   - the AUDIT path without archival —
  *     [[graft.streaming.SwitchLog.pointerAsOf]] against all-live
  *     records, one 1-row job per record up to the answer (planted
  *     mid-history, so ~N/2 reads), and
  *   - the AUDIT path with the q94 archive — the same as-of question
  *     against a root archived down to 2 live records: one job over
  *     the consolidated checkpoint regardless of N,
  *
  * at several history depths. The old trigger shape and the
  * unarchived audit grow linearly with the stream's lifetime; the
  * shipped pointer and the archived audit are flat.
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
    // a second planted root per the same schedule, archived at every
    // depth (keep=2) — the q94 shape; incremental re-archival at each
    // depth exercises the consolidation path the adoptions run
    val rootA = graft.RunPaths.scratch("graft_switch_history_arch") + "/switch"
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
      (planted + 1 to n).foreach { r =>
        SwitchLog.write(spark, root, r, r * 10L, r * 10L + 1)
        SwitchLog.write(spark, rootA, r, r * 10L, r * 10L + 1)
      }
      planted = n
      SwitchLog.archive(spark, rootA, keep = 2)
      val mid = (n / 2) * 10L + 1 // as-of answer sits mid-history
      // the pre-round-14 derivation: one 1-row read PER record
      val oldMs = timeMs {
        SwitchLog.adopted(spark, root)
          .foreach(r => SwitchLog.foldedThrough(spark, root, r))
      }
      // the shipped derivation: listing + ONE read of the max record
      val newMs = timeMs {
        assert(SwitchLog.pointer(spark, root).exists(_._1 == n.toLong))
      }
      // audit: all-live (one job per record up to the answer) vs the
      // archived root (one consolidated job, flat in N)
      val asofFullMs = timeMs {
        assert(SwitchLog.pointerAsOf(spark, root, mid)
          .exists(_._1 == (n / 2).toLong))
      }
      val asofArchMs = timeMs {
        assert(SwitchLog.pointerAsOf(spark, rootA, mid)
          .exists(_._1 == (n / 2).toLong))
      }
      System.err.println(
        f"[switch-history] n=$n%4d old=${oldMs}%9.1f ms/call " +
          f"new=${newMs}%7.1f ms/call asof_full=${asofFullMs}%9.1f " +
          f"asof_arch=${asofArchMs}%7.1f")
      s"""{"switches":$n,"full_history_ms":${oldMs.round},""" +
        s""""pointer_ms":${newMs.round},""" +
        s""""asof_live_ms":${asofFullMs.round},""" +
        s""""asof_archived_ms":${asofArchMs.round}}"""
    }
    println(s"""{"metric":"switch_history_pointer_ms","reps":$reps,""" +
      s""""rows":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
