package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Ad-hoc stage-level profiling of individual query pipelines (r17
  * optimization round): times labelled sub-pieces of a hot query with
  * the noop sink so the cost attribution is measured, not guessed
  * (guide §1). Usage: sbt "runMain graft.tools.MicroProf <what> [sfDir]"
  */
object MicroProf {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[microprof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("q56")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    what match {
      case "q56" => profileQ56(spark, sfDir)
      case other => sys.error(s"unknown profile target: $other")
    }
    spark.stop()
  }

  private def profileQ56(spark: SparkSession, sfDir: String): Unit = {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd ---")
      time("requireSmallExact count")(
        graft.queries.LlmOps.requireSmallExact(emb.select("vec_id"), "prof", 1 << 16))
      val withN = time("jlReducedVectors build (st collect)")(
        graft.queries.Sampling.jlReducedVectors(emb, 16))
      time("reduced vectors noop")(noop(withN))
      // NOTE: this inline pair stage deliberately replicates the
      // PRE-r17 shape (no repartition before the BNL join, dot
      // computed twice) so the single-task funnel it measured stays
      // measurable next to the fixed jlCosinePairs below.
      val a = withN.select(col("vec_id").as("vec_a"), col("rv").as("ra"), col("n2").as("na"))
      val b = withN.select(col("vec_id").as("vec_b"), col("rv").as("rb"), col("n2").as("nb"))
        .limit(1 << 16)
      val pairs = a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .filter(col("na") > 0 && col("nb") > 0)
        .select(col("vec_a"), col("vec_b"),
          graft.functions.VectorFns.dot(col("ra"), col("rb")).cast("long").as("dot_red"),
          round(graft.functions.VectorFns.dot(col("ra"), col("rb")) /
            (sqrt(col("na")) * sqrt(col("nb"))), 6).as("cosine_red"))
      time("pair stage noop")(noop(pairs))
      val top = pairs.orderBy(col("cosine_red").desc, col("vec_a"), col("vec_b")).limit(20)
      time("topk count")(top.count())
      time("full q56 count")(
        graft.queries.Sampling.jlCosinePairs(emb, 16)
          .orderBy(col("cosine_red").desc, col("vec_a"), col("vec_b"))
          .limit(20).count())
    }
  }
}
