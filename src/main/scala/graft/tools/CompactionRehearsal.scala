package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generation-creep rehearsal for the streaming index (q87): measure
  * what serving actually pays when a long-lived append stream has
  * landed `gens` one-directory-per-trigger generations, versus the same
  * rows after the in-loop fold compacted them into one epoch.
  *
  * Two costs, measured separately:
  *   - plan: build the union-of-generations DataFrame and force
  *     `queryExecution.executedPlan` — the per-query planning tax of a
  *     wide union (one relation + file listing per generation);
  *   - serve: a full count over the union — listing + tiny-file open
  *     cost end to end.
  *
  * Prints one JSON line with both costs at each generation count and
  * compacted. Usage:
  *   runMain graft.tools.CompactionRehearsal <sfDir> [gens]
  */
object CompactionRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val gens = args.lift(1).map(_.toInt).getOrElse(60)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    // a realistic codes table: every embedding encoded once under a
    // frozen index, then dealt across `gens` per-trigger directories
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val idx = graft.RunPaths.scratch(
      s"graft_compreh_${graft.RunPaths.keyFor(sfDir)}_$gens")
    val (coarseF, booksF) = graft.queries.LlmOps.buildFrozenIndex(
      spark, sfDir, e, idx, "compaction-rehearsal frozen coarse table",
      withOccupancy = false)
    val codes = spark.read.parquet(s"$idx/codes/gen=0")
    for (g <- 1 to gens)
      codes.filter(pmod(col("vec_id"), lit(gens)) === g - 1)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$idx/creep/gen=$g")
    codes.repartition(col("cell_id"))
      .write.mode("overwrite").parquet(s"$idx/compacted/epoch=1")

    def union(paths: Seq[String]) = paths
      .map(p => spark.read.parquet(p)
        .select(col("cell_id"), col("vec_id"), col("codes")))
      .reduce(_.unionByName(_))
    def msOf(body: => Unit, n: Int): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      (System.nanoTime() - t0) / 1e6 / n
    }
    val points = Seq(gens / 4, gens / 2, gens).distinct.filter(_ >= 1)
    val results = points.map { g =>
      val paths = (1 to g).map(p => s"$idx/creep/gen=$p")
      val planMs = msOf(union(paths).queryExecution.executedPlan, 3)
      val serveMs = msOf(union(paths).count(), 3)
      System.err.println(
        f"[compaction] gens=$g%3d plan=${planMs}%8.1f ms serve=${serveMs}%8.1f ms")
      (s"gens_$g", planMs, serveMs)
    }
    val cPlan = msOf(union(Seq(s"$idx/compacted/epoch=1"))
      .queryExecution.executedPlan, 3)
    val cServe = msOf(union(Seq(s"$idx/compacted/epoch=1")).count(), 3)
    System.err.println(
      f"[compaction] compacted plan=${cPlan}%8.1f ms serve=${cServe}%8.1f ms")
    val rows = (results :+ (("compacted", cPlan, cServe))).map {
      case (k, p, s) =>
        s"""${graft.JsonText.quote(k)}:{"plan_ms":$p,"serve_ms":$s}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"compaction_rehearsal","points":$rows,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
