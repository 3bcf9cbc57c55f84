package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.ProductQuantizer
import graft.operators.ProductQuantizer.HouseM

/** The offline recall audit the ANN scaladocs keep referencing, made
  * real: measured recall@k of the served IVF-PQ index across the
  * nProbe dial, plus the refine stage's lift, against brute-force
  * exact ground truth — averaged over a deterministic sample of
  * corpus vectors used as queries (leave-self-out, so recall is not
  * inflated by each query finding itself).
  *
  * At 100 TB this is exactly the periodic audit job a serving team
  * runs: the GT brute-force scan is affordable for a SAMPLE of
  * queries even when it is unthinkable per request, and the output —
  * the recall curve — is what justifies the nProbe/refine settings
  * the serving path pays for. The q96 theorem (refine ≥ ADC on every
  * instance) is asserted live across every sampled query; a single
  * violation fails the run.
  *
  * Usage: runMain graft.tools.RecallAudit [sfDir] [k] [nQueries]
  * Prints one JSON line:
  *   {"metric":"recall_audit","k":…,"n_queries":…,
  *    "methods":{"ivfpq_p1":r,…,"ivfpq_p4_refine":r},
  *    "refine_theorem_violations":0,"sf":…}
  */
object RecallAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val idx = graft.queries.LlmOps.ensureAnnServeIndex(spark, sfDir)
    val coarse = spark.read.parquet(s"$idx/coarse")
    val books = spark.read.parquet(s"$idx/books")
    val codes = spark.read.parquet(s"$idx/codes")
      .select(col("cell_id"), col("vec_id"), col("codes"))
    val nCells = coarse.count().toInt
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") =!= 0)

    // deterministic query sample: fixed residue class, ordered
    val queryIds = e.filter(pmod(col("vec_id"), lit(37)) === 1)
      .select(col("vec_id")).orderBy(col("vec_id")).limit(nQueries)
      .collect().map(_.getLong(0)).toSeq
    require(queryIds.nonEmpty, s"no query sample at $sfDir")

    // the full dial, refine lift at every probe (r15 verdict #3: the
    // served operating point must be PICKED from this curve, so the
    // audit has to resolve the region between "cheap" and "ceiling")
    val probes = Seq(1, 2, 4, 8, 12, 16, 24, 32, nCells)
      .distinct.filter(_ <= nCells).sorted
    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    var violations = 0
    val perMethod = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(0.0)
    for (qid <- queryIds) {
      val query = e.filter(col("vec_id") === qid)
        .select(col("embedding")).limit(1)
      val corpusX = e.filter(col("vec_id") =!= qid)
      val codesX = codes.filter(col("vec_id") =!= qid)
      val q = query.select(col("embedding").as("qv"))
      val exactD = VectorFns.normSq(col("embedding")) -
        lit(2.0) * VectorFns.dot(col("embedding"), col("qv")) +
        VectorFns.normSq(col("qv"))
      val gt = ids(corpusX.crossJoin(broadcast(q))
        .select(col("vec_id"), exactD.as("d"))
        .orderBy(col("d").asc, col("vec_id").asc).limit(k))
      for (p <- probes) {
        val got = ids(ProductQuantizer.ivfPqTopK(query, "embedding", HouseM,
          coarse, books, codesX, "vec_id", nProbe = p, k = k))
        val hits = got.intersect(gt).size
        perMethod(s"ivfpq_p$p") += hits.toDouble / gt.size
        val cands = ProductQuantizer.ivfPqScores(query, "embedding", HouseM,
            coarse, books, codesX, "vec_id", nProbe = p)
          .orderBy(col("adc_dist").asc, col("vec_id").asc).limit(4 * k)
          .select(col("vec_id"))
        val refined = ids(ProductQuantizer.exactRerank(cands,
          corpusX.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", query, "embedding", k))
        val refineHits = refined.intersect(gt).size
        perMethod(s"ivfpq_p${p}_refine") += refineHits.toDouble / gt.size
        if (refineHits < hits) violations += 1
      }
    }
    require(violations == 0,
      s"q96 refine theorem violated on $violations instances " +
        "— refine recall must dominate ADC recall per instance")

    // measured serve latency per probe setting (min-of-3 single-query
    // ADC top-k over the persisted codes — the q68_ann_serve shape),
    // so the operating point is a (recall, latency) pair, not a guess
    val latQuery = e.filter(col("vec_id") === queryIds.head)
      .select(col("embedding")).limit(1)
    val latency = probes.map { p =>
      def once(): Double = {
        val t0 = System.nanoTime()
        ProductQuantizer.ivfPqTopK(latQuery, "embedding", HouseM,
          coarse, books, codes, "vec_id", nProbe = p, k = k).count()
        (System.nanoTime() - t0) / 1e9
      }
      p -> Seq(once(), once(), once()).min
    }

    val methods = probes
      .flatMap(p => Seq(s"ivfpq_p$p", s"ivfpq_p${p}_refine"))
      .map(mth => s"${graft.JsonText.quote(mth)}:" +
        f"${perMethod(mth) / queryIds.size}%.4f")
      .mkString("{", ",", "}")
    val lat = latency.map { case (p, s) => s""""p$p":$s""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"recall_audit","k":$k,"n_queries":${queryIds.size},"n_cells":$nCells,"methods":$methods,"serve_sec":$lat,"refine_theorem_violations":$violations,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
