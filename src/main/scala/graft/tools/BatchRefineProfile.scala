package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer
import graft.operators.ProductQuantizer.{HouseM, HouseNProbe}

/** Stage-level profile of q100_batch_serve's 10× growth (r16 lead
  * item): the r15 rehearsal measured the full two-stage pipeline at
  * 1.47× for 10× data while the ADC stage alone was 1.11× — before
  * re-architecting the refine fetch, measure WHICH refine term grows:
  * the raw-vector scan itself, the stage-1 re-execution feeding the
  * candidate broadcast, or the query-table derivation. Times each
  * component min-of-3 on a base dir and its 10× blowup.
  *
  * Usage: runMain graft.tools.BatchRefineProfile [sfDir] [blowupDir] [factor]
  */
object BatchRefineProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val blowDir = args.lift(1).getOrElse("/tmp/graft_blowup_x10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    ScaleRehearsal.buildBlowup(spark, sfDir, factor, blowDir)

    def profile(dir: String): Seq[(String, Double)] = {
      val idx = graft.queries.LlmOps.ensureAnnServeIndex(spark, dir)
      val rawDir = graft.queries.LlmOps.ensureRefineServeLayout(spark, dir)
      val coarseF = spark.read.parquet(s"$idx/coarse")
      val booksF = spark.read.parquet(s"$idx/books")
      val codes = spark.read.parquet(s"$idx/codes")
        .select(col("cell_id"), col("vec_id"), col("codes"))
      val raw = spark.read.parquet(rawDir)
      def queriesDf: DataFrame = graft.Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") =!= 0)
        .filter(pmod(col("vec_id"), lit(13)) === 1)
        .orderBy(col("vec_id")).limit(64)
        .select(col("vec_id").as("qid"), col("embedding"))
      def time(label: String)(body: => Unit): (String, Double) = {
        def once(): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        val s = Seq(once(), once(), once()).min
        System.err.println(f"[profile] $dir $label%-28s $s%7.3f s")
        label -> s
      }
      val stage1 = ProductQuantizer.ivfPqTopKBatch(queriesDf, "qid",
          "embedding", HouseM, coarseF, booksF, codes, "vec_id",
          nProbe = HouseNProbe, k = 40)
        .select(col("qid"), col("vec_id"))
      // candidates pre-materialized: isolates the pure fetch+rerank
      // cost from the stage-1 re-execution the broadcast pays
      val candMat = stage1.localCheckpoint(true)
      val qMat = queriesDf.localCheckpoint(true)
      Seq(
        time("queries_derive")(queriesDf.count()),
        time("raw_scan_only")(raw.agg(count(lit(1))).collect()),
        time("raw_scan_decode")(raw.agg(sum(element_at(col("embedding"), 1)))
          .collect()),
        time("stage1_adc")(stage1.count()),
        time("refine_given_cand")(ProductQuantizer.exactRerankBatch(
          candMat, raw, "vec_id", "embedding", qMat, "qid", "embedding",
          10, knownQ = 64).count()),
        time("refine_pruned_given_cand") {
          val bucketedDir =
            graft.queries.LlmOps.ensureRefineBucketedLayout(spark, dir)
          val (fetched, _) = graft.queries.LlmOps.batchPrunedFetch(
            spark, bucketedDir, candMat, "vec_id", maxBuckets = 64 * 40)
          ProductQuantizer.exactRerankBatch(candMat, fetched, "vec_id",
            "embedding", qMat, "qid", "embedding", 10, knownQ = 64)
            .count()
        },
        time("full_two_stage_pruned") {
          val bucketedDir =
            graft.queries.LlmOps.ensureRefineBucketedLayout(spark, dir)
          val c = ProductQuantizer.ivfPqTopKBatch(queriesDf, "qid",
              "embedding", HouseM, coarseF, booksF, codes, "vec_id",
              nProbe = HouseNProbe, k = 40, knownQ = 64)
            .select(col("qid"), col("vec_id"))
            .localCheckpoint(true)
          val (fetched, _) = graft.queries.LlmOps.batchPrunedFetch(
            spark, bucketedDir, c, "vec_id", maxBuckets = 64 * 40)
          ProductQuantizer.exactRerankBatch(c, fetched, "vec_id",
            "embedding", qMat, "qid", "embedding", 10, knownQ = 64)
            .count()
        },
        time("full_two_stage") {
          val c = ProductQuantizer.ivfPqTopKBatch(queriesDf, "qid",
              "embedding", HouseM, coarseF, booksF, codes, "vec_id",
              nProbe = HouseNProbe, k = 40)
            .select(col("qid"), col("vec_id"))
          ProductQuantizer.exactRerankBatch(c, raw, "vec_id", "embedding",
            queriesDf, "qid", "embedding", 10, knownQ = 64).count()
        })
    }

    val base = profile(sfDir)
    val blown = profile(blowDir)
    val json = base.zip(blown).map { case ((l, b), (_, s)) =>
      s"${graft.JsonText.quote(l)}:{" +
        s""""base_sec":$b,"scaled_sec":$s,"factor":${s / b}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"batch_refine_profile","data_factor":$factor,"stages":$json,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
