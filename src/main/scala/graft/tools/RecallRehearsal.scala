package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.{IndexDrift, ProductQuantizer}
import graft.operators.ProductQuantizer.{HouseEvery, HouseM}

/** Recall-decay rehearsal for the frozen-model ANN index (VERDICT r8/r9
  * item: "when does freezing break?").
  *
  * q68/q69/q75 all encode appended batches against centroids and
  * codebooks FROZEN at build time. This tool measures what that costs:
  * recall@k of IVF-PQ serving versus exact brute-force over the SAME
  * corpus, as the appended (frozen-encoded) fraction grows — and for a
  * deliberately drifted append (each component shifted +0.5, a region
  * the frozen centroids don't cover). Each scenario also reports the
  * cell-occupancy PSI the retrain trigger (operators/IndexDrift.scala)
  * would have seen for that append, so the trigger threshold can be
  * read off against the recall it predicts. A from-scratch retrain at
  * full append answers "what a retrain buys back".
  *
  * Scenarios (fraction of the held-out append set, encode mode):
  *   base      — index = base corpus only (frozen-model floor: 0 appends)
  *   half      — 50% of appends frozen-encoded
  *   full      — 100% of appends frozen-encoded
  *   drift     — 100% of appends, shifted +0.5, frozen-encoded
  *   retrain   — 100% of appends, models RETRAINED on the merged corpus
  *   retrain_drift — shifted appends, retrained on the merged corpus
  *
  * Recall is averaged over `nQueries` held-out query vectors (never in
  * any index), each scored against the exact top-k of the scenario's
  * own corpus.
  *
  * Usage: runMain graft.tools.RecallRehearsal <sfDir> [nQueries] [k]
  */
object RecallRehearsal {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.tools.RecallRehearsal <sfDir> [nQueries] [k]")
      sys.exit(2)
    }
    val dir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 20
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") =!= 0)
    // held-out queries: a deterministic residue class, never indexed
    val queries = e.filter(pmod(col("vec_id"), lit(25)) === 7)
      .orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id"), col("embedding")).collect()
    val corpus = e.filter(pmod(col("vec_id"), lit(25)) =!= 7)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val base = corpus.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val appends = corpus.filter(pmod(col("vec_id"), lit(10)) === 9)
    // the ONE drift transform (shared with q76 and its spec), so the
    // rehearsal table and the trigger threshold stay calibrated to the
    // same scenario
    def shifted(df: DataFrame): DataFrame =
      IndexDrift.shifted(df, "vec_id", "embedding")

    // frozen models: trained on base only, persisted + read back so all
    // scenarios serve the SAME floats (q68's self-consistency pattern)
    val idx = graft.RunPaths.scratch(
      "graft_recall_rehearsal_" + graft.RunPaths.keyFor(dir))
    val coarse0 = graft.queries.LlmOps.ivfCentroids(spark, dir, base)
    coarse0.write.mode("overwrite").parquet(s"$idx/coarse")
    ProductQuantizer.ivfPqTrainBooks(
        base, "vec_id", "embedding", m = HouseM, coarse0, every = HouseEvery, iters = 2)
      .write.mode("overwrite").parquet(s"$idx/books")
    val coarseF = spark.read.parquet(s"$idx/coarse").localCheckpoint(true)
    val booksF = spark.read.parquet(s"$idx/books").localCheckpoint(true)

    def frozenCodes(df: DataFrame): DataFrame =
      ProductQuantizer.ivfPqEncodeWith(
        df, "vec_id", "embedding", HouseM, coarseF, booksF)

    /** Mean recall@k of IVF-PQ serving vs exact top-k over `corpusDf`,
      * for the given query rows.
      */
    def recall(corpusDf: DataFrame, coarse: DataFrame, books: DataFrame,
        codes: DataFrame,
        qrows: Array[org.apache.spark.sql.Row]): Double = {
      val cc = codes.localCheckpoint(true)
      val hits = qrows.map { row =>
        val q = spark.createDataFrame(
          java.util.Arrays.asList(row),
          org.apache.spark.sql.types.StructType(row.schema))
          .select(col("embedding"))
        val exact = corpusDf
          .crossJoin(broadcast(q.select(col("embedding").as("qv"))))
          .select(col("vec_id"),
            (VectorFns.normSq(col("embedding")) -
              lit(2.0) * VectorFns.dot(col("embedding"), col("qv")) +
              VectorFns.normSq(col("qv"))).as("d"))
          .orderBy(col("d").asc, col("vec_id").asc).limit(k)
        val served = ProductQuantizer.ivfPqTopK(
          q, "embedding", HouseM, coarse, books, cc, "vec_id",
          nProbe = 4, k = k)
        served.select(col("vec_id"))
          .join(exact.select(col("vec_id")), "vec_id")
          .count().toDouble / k
      }
      hits.sum / hits.length
    }

    val baseCodes = frozenCodes(base).localCheckpoint(true)
    // append ids are ≡ 9 (mod 10) — all odd, so an even/odd split would
    // be empty; split on the mod-20 residue instead (9 vs 19)
    val halfApp = appends.filter(pmod(col("vec_id"), lit(20)) === 9)

    // drifted queries: the arriving WORKLOAD follows the drift — the
    // case where frozen routing/codebooks actually face the new region
    val driftedQueries: Array[org.apache.spark.sql.Row] = queries.map { r =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(r.getLong(0), r.getSeq[Float](1).map(_ + 0.5f)), r.schema)
    }

    case class Scenario(name: String, corpusDf: DataFrame,
      coarse: DataFrame, books: DataFrame, codes: DataFrame,
      batch: Option[DataFrame],
      qrows: Array[org.apache.spark.sql.Row] = queries)

    def retrained(corpusDf: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val c = graft.queries.LlmOps.ivfCentroids(spark, dir, corpusDf)
      val (codes, books) = ProductQuantizer.ivfPqEncode(
        corpusDf, "vec_id", "embedding", m = HouseM, c, every = HouseEvery, iters = 2)
      (c, books, codes)
    }
    val mergedIn = base.unionByName(appends)
    val mergedDr = base.unionByName(shifted(appends))
    val (rc, rb, rcodes) = retrained(mergedIn)
    val (dc, db, dcodes) = retrained(mergedDr)

    val driftCodes = baseCodes.unionByName(frozenCodes(shifted(appends)))
    val scenarios = Seq(
      Scenario("base", base, coarseF, booksF, baseCodes, None),
      Scenario("half", base.unionByName(halfApp), coarseF, booksF,
        baseCodes.unionByName(frozenCodes(halfApp)), Some(halfApp)),
      Scenario("full", mergedIn, coarseF, booksF,
        baseCodes.unionByName(frozenCodes(appends)), Some(appends)),
      Scenario("drift", mergedDr, coarseF, booksF, driftCodes,
        Some(shifted(appends))),
      Scenario("drift_dq", mergedDr, coarseF, booksF, driftCodes,
        Some(shifted(appends)), driftedQueries),
      Scenario("retrain", mergedIn, rc, rb, rcodes, None),
      Scenario("retrain_drift", mergedDr, dc, db, dcodes, None),
      Scenario("retrain_drift_dq", mergedDr, dc, db, dcodes, None,
        driftedQueries))

    val rows = scenarios.map { sc =>
      val r = recall(sc.corpusDf, sc.coarse, sc.books, sc.codes, sc.qrows)
      val psi = sc.batch.map { b =>
        IndexDrift.occupancyPsi(base, b, "vec_id", "embedding", coarseF)
          .collect().head.getAs[Double]("psi")
      }
      System.err.println(f"[recall] ${sc.name}%-14s recall@$k ${r}%.3f" +
        psi.map(p => f"  psi ${p}%.3f").getOrElse(""))
      (sc.name, r, psi)
    }
    val json = rows.map { case (n, r, psi) =>
      s"${graft.JsonText.quote(n)}:{" +
        f""""recall":$r%.4f""" +
        psi.map(p => f""","psi":$p%.4f""").getOrElse("") + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"recall_rehearsal","k":$k,"n_queries":${queries.length},"scenarios":$json,"sf":${graft.JsonText.quote(dir)}}""")
    spark.stop()
  }
}
