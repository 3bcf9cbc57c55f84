package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.ProductQuantizer
import graft.operators.ProductQuantizer.HouseM

/** Measures the q95 starvation claim — and since r15, the CURE —
  * instead of asserting either: recall@k of three filtered-ANN
  * strategies against exact filtered ground truth, across a predicate
  * SELECTIVITY SWEEP (~50 % / ~10 % / ~1 %):
  *
  *   - `pre_fixed`: pre-filter at fixed nProbe=4 (restrict the codes
  *     to the predicate, probe 4 cells) — the r14 baseline;
  *   - `post_k4`: post-filter with 4k oversampling (probe all labels,
  *     filter) — the no-storage-requirement strategy the r14 audit
  *     measured starving (−31 % at 10 % selectivity);
  *   - `pre_policy`: pre-filter under the LABEL-AWARE PROBE POLICY
  *     (LlmOps.labelAwareNProbe): probe cells in query-affinity order
  *     until the predicate rows scanned reach the SAME row budget an
  *     unfiltered nProbe=4 probe pays (4·n/K) — a selective predicate
  *     probes MORE cells at equal I/O instead of starving.
  *
  * Every strategy reports recall AND the budget it actually spent
  * (avg cells probed, avg predicate rows scanned), so "the policy
  * beats fixed-nProbe at equal row budget" is a read-off from the
  * artifact, not a claim. The q95 structural theorem (post ⊆ pre
  * under shared probes ⇒ recall(pre) ≥ recall(post) per instance at
  * the same nProbe) is re-checked on every sampled query; a violation
  * fails the run. A sampled query whose predicate has no other corpus
  * member (empty ground truth — the r14 ADVICE 0/0 = NaN finding) is
  * SKIPPED and counted, never averaged as NaN.
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
      .localCheckpoint(true)
    val nCorpus = codesMeta.count()
    val nCells = coarse.count().toInt
    // the unfiltered row budget a fixed nProbe=4 probe pays: 4 average
    // cells' worth of postings
    val budgetRows = 4L * nCorpus / nCells

    // centroids to the driver ONCE (a model-scale read): the policy
    // ranks cells per query by the same ‖q−c‖² affinity the serving
    // probe uses, then walks the predicate's per-cell occupancy
    val cents: Seq[(Long, Array[Double])] = coarse.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

    val qrows = e.filter(pmod(col("vec_id"), lit(37)) === 1)
      .select(col("vec_id"), col("label"), col("embedding"))
      .orderBy(col("vec_id"))
      .limit(nQueries).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray)).toSeq
    require(qrows.nonEmpty, s"no query sample at $sfDir")

    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    // the sweep: ~50 % (half the labels), ~10 % (one label), ~1 %
    // (a 1-in-100 id residue — the shape of a rare-source predicate)
    def predicates(qid: Long, lbl: Int): Seq[(String, Column)] = Seq(
      ("sel50", col("label") < 5),
      ("sel10", col("label") === lbl),
      ("sel1", pmod(col("vec_id"), lit(100)) === (qid % 100).toInt))

    var violations = 0
    val skips = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    val recall = scala.collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(0.0)
    val cellsSpent = scala.collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(0.0)
    val rowsSpent = scala.collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(0.0)
    val counted = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)

    for ((qid, lbl, qv) <- qrows; (sel, pred) <- predicates(qid, lbl)) {
      val query = e.filter(col("vec_id") === qid)
        .select(col("embedding")).limit(1)
      val corpusP = e.filter(col("vec_id") =!= qid).filter(pred)
      val q = query.select(col("embedding").as("qv"))
      val exactD = VectorFns.normSq(col("embedding")) -
        lit(2.0) * VectorFns.dot(col("embedding"), col("qv")) +
        VectorFns.normSq(col("qv"))
      val gt = ids(corpusP.crossJoin(broadcast(q))
        .select(col("vec_id"), exactD.as("d"))
        .orderBy(col("d").asc, col("vec_id").asc).limit(k))
      if (gt.isEmpty) {
        skips(sel) += 1 // r14 ADVICE: 0/0 would corrupt every average
      } else {
        counted(sel) += 1
        val codesX = codesMeta.filter(col("vec_id") =!= qid)
        val filteredCodes = codesX.filter(pred)
        // per-cell predicate occupancy in query-affinity order: the
        // driver-scale statistic (≤ K rows) the policy walks
        val occByCell = filteredCodes.groupBy(col("cell_id"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val occAllByCell = codesX.groupBy(col("cell_id"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val rankedCells = cents
          .map { case (cid, cv) =>
            val d = cv.zip(qv).map { case (c, x) => (x - c) * (x - c) }.sum
            (cid, d)
          }
          .sortBy { case (cid, d) => (d, cid) }
          .map(_._1)
        val rankedOcc = rankedCells.map(c => occByCell.getOrElse(c, 0L))
        val pPolicy = graft.queries.LlmOps.labelAwareNProbe(
          rankedOcc, budgetRows, minProbe = 4, maxProbe = nCells)

        def recAndSpend(nProbe: Int): (Double, Double) = {
          val got = ids(ProductQuantizer.ivfPqTopK(query, "embedding",
            HouseM, coarse, books, filteredCodes, "vec_id", nProbe, k))
          (got.intersect(gt).size.toDouble / gt.size,
            rankedOcc.take(nProbe).sum.toDouble)
        }
        val (rPre, rowsPre) = recAndSpend(4)
        val (rPol, rowsPol) = recAndSpend(pPolicy)
        val post4 = ids(ProductQuantizer.ivfPqTopK(query, "embedding",
            HouseM, coarse, books, codesX, "vec_id", nProbe = 4,
            k = 4 * k)
          .join(filteredCodes.select(col("vec_id")), "vec_id")
          .orderBy(col("adc_dist").asc, col("vec_id").asc).limit(k))
        val hPost = post4.intersect(gt).size
        if (hPost.toDouble / gt.size > rPre + 1e-12) violations += 1
        recall(("pre_fixed", sel)) += rPre
        recall(("pre_policy", sel)) += rPol
        recall(("post_k4", sel)) += hPost.toDouble / gt.size
        cellsSpent(("pre_fixed", sel)) += 4.0
        cellsSpent(("pre_policy", sel)) += pPolicy.toDouble
        cellsSpent(("post_k4", sel)) += 4.0
        rowsSpent(("pre_fixed", sel)) += rowsPre
        rowsSpent(("pre_policy", sel)) += rowsPol
        // post scans the UNFILTERED postings of its 4 cells — the
        // honest spend of the no-second-index strategy
        rowsSpent(("post_k4", sel)) +=
          rankedCells.take(4).map(c => occAllByCell.getOrElse(c, 0L))
            .sum.toDouble
      }
    }
    require(violations == 0,
      s"q95 theorem violated on $violations queries — post-filter " +
        "recall must never exceed fixed pre-filter recall")

    val sels = Seq("sel50", "sel10", "sel1")
    val body = sels.map { sel =>
      val n = math.max(counted(sel), 1)
      val arms = Seq("pre_fixed", "pre_policy", "post_k4").map { arm =>
        s"${graft.JsonText.quote(arm)}:{" +
          f""""recall":${recall((arm, sel)) / n}%.4f,""" +
          f""""avg_cells":${cellsSpent((arm, sel)) / n}%.1f,""" +
          f""""avg_rows":${rowsSpent((arm, sel)) / n}%.1f}"""
      }.mkString(",")
      s"${graft.JsonText.quote(sel)}:{" +
        s""""n":${counted(sel)},"skipped":${skips(sel)},$arms}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"filtered_recall_audit","k":$k,"n_queries":${qrows.size},"budget_rows":$budgetRows,"selectivities":$body,"violations":$violations,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
