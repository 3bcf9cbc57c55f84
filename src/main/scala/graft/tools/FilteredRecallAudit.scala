package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.ProductQuantizer

/** Measures the q95 starvation claim instead of asserting it: recall@k
  * of PRE-filter (restrict the codes to the predicate, then probe)
  * versus POST-filter (probe all labels at k', then filter) for
  * label-restricted queries, against exact filtered ground truth.
  * Each sampled query uses its OWN label as the predicate (~10 %
  * selectivity on the test corpus), leave-self-out.
  *
  * The structural theorem from q95 — post ⊆ pre under shared probes,
  * hence recall(pre) ≥ recall(post) per instance — is re-checked on
  * every sampled query; a violation fails the run. What the numbers
  * ADD is the size of the gap: how much answer quality the
  * no-storage-requirement strategy actually gives up at this
  * selectivity, and how much of it the k' oversampling buys back.
  *
  * Usage: runMain graft.tools.FilteredRecallAudit [sfDir] [k] [nQueries]
  */
object FilteredRecallAudit {

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
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") =!= 0)
    val codesMeta = spark.read.parquet(s"$idx/codes")
      .select(col("cell_id"), col("vec_id"), col("codes"))
      .join(e.select(col("vec_id"), col("label")), "vec_id")

    val qrows = e.filter(pmod(col("vec_id"), lit(37)) === 1)
      .select(col("vec_id"), col("label")).orderBy(col("vec_id"))
      .limit(nQueries).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    require(qrows.nonEmpty, s"no query sample at $sfDir")

    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    var violations = 0
    var (preR, post4R, post1R) = (0.0, 0.0, 0.0)
    for ((qid, lbl) <- qrows) {
      val query = e.filter(col("vec_id") === qid)
        .select(col("embedding")).limit(1)
      val corpusL = e.filter(col("vec_id") =!= qid &&
        col("label") === lbl)
      val q = query.select(col("embedding").as("qv"))
      val exactD = VectorFns.normSq(col("embedding")) -
        lit(2.0) * VectorFns.dot(col("embedding"), col("qv")) +
        VectorFns.normSq(col("qv"))
      val gt = ids(corpusL.crossJoin(broadcast(q))
        .select(col("vec_id"), exactD.as("d"))
        .orderBy(col("d").asc, col("vec_id").asc).limit(k))
      val codesX = codesMeta.filter(col("vec_id") =!= qid)
      val pre = ids(ProductQuantizer.ivfPqTopK(query, "embedding", 8,
        coarse, books, codesX.filter(col("label") === lbl),
        "vec_id", nProbe = 4, k = k))
      def post(kPrime: Int): Set[Long] = ids(
        ProductQuantizer.ivfPqTopK(query, "embedding", 8, coarse, books,
            codesX, "vec_id", nProbe = 4, k = kPrime)
          .join(codesX.select(col("vec_id"), col("label")), "vec_id")
          .filter(col("label") === lbl)
          .orderBy(col("adc_dist").asc, col("vec_id").asc).limit(k))
      val (p4, p1) = (post(4 * k), post(k))
      val (hPre, h4, h1) = (pre.intersect(gt).size,
        p4.intersect(gt).size, p1.intersect(gt).size)
      if (h4 > hPre || h1 > hPre) violations += 1
      preR += hPre.toDouble / gt.size
      post4R += h4.toDouble / gt.size
      post1R += h1.toDouble / gt.size
    }
    require(violations == 0,
      s"q95 theorem violated on $violations/${qrows.size} queries — " +
        "post-filter recall must never exceed pre-filter recall")
    val n = qrows.size
    println(f"""{"metric":"filtered_recall_audit","k":$k,"n_queries":$n,"pre":${preR / n}%.4f,"post_k4":${post4R / n}%.4f,"post_k1":${post1R / n}%.4f,"violations":$violations,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
