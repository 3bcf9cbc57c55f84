package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** The r18 scaling sample (r17 verdict #4): times a fixed query subset
  * against a ScaleFixture-replicated directory at the given core count
  * and prints one JSON line, so an 8-vs-32-core ratio table can be
  * built from entries that are SECONDS long instead of sf0.1's
  * overhead-dominated sub-second readings. Min of two runs per query
  * (one warm-up effect absorbed); a query that throws reports "err".
  *
  * Deliberately excluded: embeddings/ANN entries (replicated
  * near-identical vectors make bucketed verifiers quadratic, not
  * bigger), q02 (reads its own generated xlsx fixture, independent of
  * the SF dir), streaming entries (trigger-bound, measured separately).
  *
  * Usage:
  *   sbt "runMain graft.tools.ScaleSample <sfDir> <cpus> [q1,q2,...]"
  */
object ScaleSample {

  val DefaultSet: Seq[String] = Seq(
    "q22_dedup_exact", "q22_dup_ngram_frac",
    "q23_jaccard_pairs", "q23_minhash_lsh", "q23_dedup_clusters",
    "q47_self_excise", "q47_source_overlap", "q55_boilerplate_excise",
    "q61_quality_perceptron", "q46_bpe_train", "q45_dsir_weights",
    "q98_maxsim_rerank",
    "q05_join_star", "q08_agg_tpch_q1", "q05_sql_tpch_q3",
    "q07_join_range", "q11_window_rank")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSample <sfDir> <cpus> [names]")
    val sfDir = args(0)
    val cpus = args(1).toInt
    val names = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultSet)
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", 32)
      // measurement-side only: the x16 fixture is still ~10 MB of text,
      // and default split packing (128 MB + 4 MB open cost) folds its 32
      // files into 1-2 scan splits — which would measure FILE PACKING,
      // not operator scaling. Small splits give scans real parallelism
      // at both core counts; the product session is untouched.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val results = names.map { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try {
          spark.sparkContext.setJobDescription(s"scalesample $n")
          q.run(spark, sfDir).count()
          Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable => Left(
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
      val r = (once(), once()) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Left(m), _) => Left(m)
        case (_, Left(m)) => Left(m)
      }
      println(f"[scalesample] $n%-24s ${r.fold(m => m, s => f"$s%8.3f s")}")
      n -> r
    }
    val qs = results.map {
      case (k, Right(s)) => s""""$k":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))}"""
      case (k, Left(m)) => s""""$k":{"err":${graft.JsonText.quote(m)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"scalesample":{"cpus":$cpus,"sf":"$sfDir","queries":$qs}}""")
    spark.stop()
  }
}
