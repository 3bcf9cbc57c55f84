package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer
import graft.operators.ProductQuantizer.HouseM

/** Measures the claim q100_batch_serve exists for: batching amortizes
  * the fixed serve costs (probe planning, LUT build, the refine
  * stage's raw scan) over the query set, so per-query cost FALLS as
  * the batch grows — where a per-query driver loop would hold it
  * constant. Runs the full two-stage batch pipeline (ADC top-40 →
  * exact rerank top-10) at growing query-table sizes over the shared
  * persisted index and prints wall seconds + ms/query per size
  * (min-of-3, Bench discipline). The single-query baseline is the
  * same pipeline at Q=1 — i.e. exactly what a driver loop would pay
  * PER QUERY, making the amortization factor a direct read-off.
  *
  * Usage: runMain graft.tools.BatchServeRehearsal [sfDir] [sizes]
  */
object BatchServeRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16, 64, 256))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val idx = graft.queries.LlmOps.ensureAnnServeIndex(spark, sfDir)
    val bucketedDir =
      graft.queries.LlmOps.ensureRefineBucketedLayout(spark, sfDir)
    val coarseF = spark.read.parquet(s"$idx/coarse")
    val booksF = spark.read.parquet(s"$idx/books")
    val codes = spark.read.parquet(s"$idx/codes")
      .select(col("cell_id"), col("vec_id"), col("codes"))
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") =!= 0)

    val out = sizes.map { q =>
      // a fixed residue keeps the query set deterministic; mod 3 gives
      // enough members for Q=256 at sf0.1
      val queries = e.filter(pmod(col("vec_id"), lit(3)) === 1)
        .orderBy(col("vec_id")).limit(q)
        .select(col("vec_id").as("qid"), col("embedding"))
        .localCheckpoint(true)
      val nQ = queries.count()
      def once(): Double = {
        val t0 = System.nanoTime()
        // the shipping q100 shape (r16): stage-1 materialized once,
        // partition-pruned candidate fetch, batch rerank
        val cands = ProductQuantizer.ivfPqTopKBatch(queries, "qid",
            "embedding", HouseM, coarseF, booksF, codes, "vec_id",
            nProbe = 4, k = 40, knownQ = nQ)
          .select(col("qid"), col("vec_id"))
          .localCheckpoint(true)
        val (fetched, _) = graft.queries.LlmOps.batchPrunedFetch(
          spark, bucketedDir, cands, "vec_id", maxBuckets = q * 40)
        ProductQuantizer.exactRerankBatch(cands, fetched, "vec_id",
          "embedding", queries, "qid", "embedding", 10, knownQ = nQ)
          .count()
        (System.nanoTime() - t0) / 1e9
      }
      val sec = Seq(once(), once(), once()).min
      System.err.println(
        f"[batch] Q=$nQ%-4d wall=$sec%6.2f s  ${sec * 1000 / nQ}%8.1f ms/query")
      (nQ, sec)
    }
    val json = out.map { case (q, s) =>
      s""""q$q":{"wall_sec":$s,"ms_per_query":${s * 1000 / q}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"batch_serve_rehearsal","sizes":$json,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
