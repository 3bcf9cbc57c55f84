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
      case "q61" => profileQ61(spark, sfDir)
      case "q61plan" => q61EpochPlan(spark, sfDir)
      case "q23cc" => profileQ23cc(spark, sfDir)
      case "q47ab" => profileQ47ab(spark, sfDir)
      case "q02alloc" => profileQ02Alloc()
      case "q23lsh" => profileQ23lsh(spark, sfDir)
      case "q101" => profileQ101(spark, sfDir)
      case "q101fine" => profileQ101Fine(spark, sfDir)
      case other => sys.error(s"unknown profile target: $other")
    }
    spark.stop()
  }

  /** Dumps the epoch-margin window plan over the persisted layout so the
    * sort-before-persist claim (r18: no per-epoch Sort) is checkable.
    */
  private def q61EpochPlan(spark: SparkSession, sfDir: String): Unit = {
    val feat0 = graft.queries.Classifier.perceptronFeatures(
      graft.Tables.load(spark, sfDir, "documents"))
    def epochPlan(sorted: Boolean): String = {
      val base = graft.operators.Perceptron.withBias(feat0)
        .repartition(col("doc_id"))
      val feat = (if (sorted) base.sortWithinPartitions(col("doc_id"))
                  else base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      feat.count()
      val w0: Map[Long, Long] = (-1L until 32L).map(_ -> 0L).toMap
      val entries = w0.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      val m = feat.withColumn("m",
        sum(element_at(map(entries: _*), col("bucket")) * col("x")).over(win))
        .filter(col("y") * col("m") <= 0)
        .groupBy("bucket")
        .agg(sum(col("y") * col("x")).as("dw"), count(lit(1)).as("n"))
      val plan = m.queryExecution.executedPlan.toString
      feat.unpersist()
      plan
    }
    println("=== epoch plan, UNSORTED persist (pre-r18) ===")
    println(epochPlan(sorted = false))
    println("=== epoch plan, SORTED persist (r18) ===")
    println(epochPlan(sorted = true))
  }

  private def profileQ61(spark: SparkSession, sfDir: String): Unit = {
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd ---")
      val feat0 = time("featurize plan build")(
        graft.queries.Classifier.perceptronFeatures(
          graft.Tables.load(spark, sfDir, "documents")))
      val feat = graft.operators.Perceptron.withBias(feat0)
        .repartition(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("featurize materialize (count)")(feat.count())
      val w0: Map[Long, Long] = (-1L until 32L).map(_ -> 0L).toMap
      val mis = graft.operators.Perceptron.margins(feat, w0)
        .filter(col("y") * col("m") <= 0).select(col("doc_id"))
      time("one epoch (update agg collect)")(
        feat.join(mis, Seq("doc_id")).groupBy("bucket")
          .agg(sum(col("y") * col("x")).as("dw"), count(lit(1)).as("n"))
          .collect())
      time("final errors count")(
        graft.operators.Perceptron.margins(feat, w0)
          .filter(col("y") * col("m") <= 0).count())
      feat.unpersist()
      time("full q61 train")(
        graft.operators.Perceptron.train(feat0, buckets = 32, epochs = 4))
    }
  }

  /** Allocation + time profile of the q02 xlsx pull-parser inner loop
    * (r17 verdict #6): iterates the 200k x 8 bench workbook's cells
    * directly (no Spark pipeline around it) and reports bytes allocated
    * per cell via ThreadMXBean, so "object churn in the hot loop" is a
    * measured number instead of a suspicion.
    */
  private def profileQ02Alloc(): Unit = {
    val src = graft.queries.Conversion.ensureBenchFixture()
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    (1 to 3).foreach { rnd =>
      val wb = new graft.sources.excel.XlsxParser.Workbook(src)
      val target = wb.resolveSheet(None, None).target
      val it = wb.cellsForScan(target)
      var cells = 0L
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      while (it.hasNext) { it.next(); cells += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = tmx.getThreadAllocatedBytes(tid) - a0
      wb.close()
      println(f"[microprof] q02 parse round $rnd: $cells%d cells, " +
        f"$sec%6.3f s, ${bytes / 1e6}%8.1f MB alloc, " +
        f"${bytes.toDouble / cells}%6.1f B/cell, " +
        f"${cells / sec / 1e6}%5.2f Mcells/s")
    }
  }

  /** A/B the two dup-gram shapes (r17 verdict #8): window over the gram
    * key vs materialize-once + map-side-combined aggregate + join-back.
    * Both compute identical rows; the loser stays compiled as the
    * documented skew fallback.
    */
  private def profileQ47ab(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd ---")
      time("selfExcise (window form) count")(
        graft.queries.Curation.selfExcise(docs, 8).count())
      time("selfExciseViaAgg (ckpt+agg+join) count")(
        graft.queries.Curation.selfExciseViaAgg(docs, 8).count())
    }
    val a = graft.queries.Curation.selfExcise(docs, 8).collect().toSet
    val b = graft.queries.Curation.selfExciseViaAgg(docs, 8).collect().toSet
    println(s"[microprof] row parity: ${a == b} (${a.size} rows)")
  }

  private def profileQ23lsh(spark: SparkSession, sfDir: String): Unit = {
    import graft.queries.LlmOps
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd ---")
      val sh = LlmOps.shingledDocs(spark, sfDir)
      time("shingledDocs noop")(noop(sh))
      val sig = sh.select(col("doc_id"),
        graft.functions.MinHashSignature.minhash_band_keys(col("sh"), 16, 8).as("bk"))
      time("signatures noop")(noop(sig))
      val cand = LlmOps.lshCandidatePairs(sh, 16, 8)
      time("candidates noop")(noop(cand))
      time("verify (full pairs) count")(
        LlmOps.verifyJaccardPairs(spark, sfDir, cand, 0.8).count())
      time("full minhashVerifiedPairs count")(
        LlmOps.minhashVerifiedPairs(spark, sfDir, 0.8).count())
    }
  }

  private def profileQ101(spark: SparkSession, sfDir: String): Unit = {
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sfDir)
    val qids = spark.read.parquet(s"$ms/pooled")
      .select(col("doc_id")).distinct()
      .filter(pmod(col("doc_id"), lit(7)) === 1)
      .orderBy(col("doc_id")).limit(32)
      .collect().map(_.getLong(0)).toSeq
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd ---")
      time("qids derive + full q101 serve count")(
        graft.queries.Semantic.maxSimServeBatch(spark, sfDir, qids,
          nProbe = 4, k = 10).count())
    }
  }

  /** Step-level replica of Semantic.maxSimServeBatch (q101) so the warm
    * floor attributes to specific driver actions: plan-guard renders,
    * the two localCheckpoints, the driver collects, and the final
    * two-stage count. Kept in lockstep with the real implementation by
    * eye — this is attribution tooling, not a correctness surface.
    */
  private def profileQ101Fine(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sfDir)
    val qids = spark.read.parquet(s"$ms/pooled")
      .select(col("doc_id")).distinct()
      .filter(pmod(col("doc_id"), lit(7)) === 1)
      .orderBy(col("doc_id")).limit(32)
      .collect().map(_.getLong(0)).toSeq
    val nProbe = 4
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd ---")
      spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
      val pooled = spark.read.parquet(s"$ms/pooled")
      val chunks = spark.read.parquet(s"$ms/chunks")
      val qcvAll = chunks.filter(col("doc_id").isin(qids.map(Long.box): _*))
      val qplan = time("guard 1: qcvAll plan render")(
        qcvAll.queryExecution.executedPlan.toString)
      require(qplan.contains("In(doc_id"))
      val qpoolDf = time("qpool checkpoint")(
        qcvAll.groupBy(col("doc_id").as("qid"), col("bucket"))
          .agg(sum(col("v")).as("qpv"))
          .localCheckpoint(true))
      val guardRows = time("guard rows collect")(
        qcvAll.groupBy(col("doc_id"))
          .agg(countDistinct(col("chunk")).as("nc")).collect())
      val qcellDf = qpoolDf.groupBy(col("qid"))
        .agg((lit(15) - coalesce(sum(when(
            col("bucket") < 4 && col("qpv") < 0,
            expr("shiftleft(1, cast(bucket as int))"))
          .otherwise(lit(0))), lit(0))).cast("int").as("qcell"))
      val cellU = spark.range(16).select(col("id").cast("int").as("cell"))
      val pw = Window.partitionBy(col("qid"))
        .orderBy(col("__ham").asc, col("cell").asc)
      val probeDf = time("probe checkpoint")(
        qcellDf.crossJoin(broadcast(cellU))
          .withColumn("__ham",
            expr("bit_count(cast(cell as bigint) ^ cast(qcell as bigint))"))
          .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(pw))
          .filter(col("__rn") <= nProbe)
          .select(col("qid"), col("cell"))
          .localCheckpoint(true))
      val unionCells = time("union cells collect")(
        probeDf.select(col("cell")).distinct()
          .collect().map(_.getInt(0)).sorted)
      val probedPool = pooled.filter(col("cell")
        .isin(unionCells.map(c => c: java.lang.Integer): _*))
      time("guard 2: probedPool plan render")(
        probedPool.queryExecution.executedPlan.toString)
      val res = time("full maxSimServeBatch build")(
        graft.queries.Semantic.maxSimServeBatch(spark, sfDir, qids,
          nProbe = nProbe, k = 10))
      time("final count")(res.count())
    }
  }

  private def profileQ23cc(spark: SparkSession, sfDir: String): Unit = {
    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd ---")
      val pairs = time("verified pairs plan build")(
        graft.queries.LlmOps.minhashVerifiedPairs(spark, sfDir, 0.8))
      time("verified pairs count")(pairs.count())
      val vertices = graft.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id").as("node"))
      val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      time("connectedComponents full")(
        graft.operators.DedupCluster.connectedComponents(vertices, edges)
          .count())
    }
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
