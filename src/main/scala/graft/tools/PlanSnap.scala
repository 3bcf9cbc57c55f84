package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dumps the formatted physical plan of named registry queries to
  * individual files — the per-round optimization evidence
  * (`plans/r<N>/<query>_<suffix>.txt`).
  *
  * Unlike PlanDump (whole-bench PLANS.md), this snapshots a narrowed set
  * before/after a change so the diff is reviewable per query. Plans are
  * post-AQE (collected after execution) so broadcast decisions and
  * coalesced exchanges reflect what actually ran.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanSnap <outDir> <suffix> <q1,q2,...> [sfDir]"
  * e.g.
  *   sbt "runMain graft.tools.PlanSnap plans/r17 before q05_join_star"
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    Files.createDirectories(outDir)

    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    // serve-path queries read persisted layouts; build them untimed the
    // same way Bench does so the dumped plan is the served plan
    try {
      graft.queries.LlmOps.ensureAnnServeIndex(spark, sfDir)
      graft.queries.Semantic.ensureMaxSimServeLayout(spark, sfDir)
    } catch { case scala.util.control.NonFatal(_) => () }

    names.foreach { n =>
      byName.get(n) match {
        case None => System.err.println(s"[plansnap] unknown query: $n")
        case Some(q) =>
          spark.sparkContext.setJobDescription(s"plansnap:$n")
          val df = q.run(spark, sfDir)
          df.collect() // finalize AQE so the plan shows runtime decisions
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).trim + "\n"
          val f = outDir.resolve(s"${n}_$suffix.txt")
          Files.write(f, txt.getBytes(StandardCharsets.UTF_8))
          println(s"wrote $f")
      }
    }
    spark.stop()
  }
}
