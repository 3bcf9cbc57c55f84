package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.ProductQuantizer

/** Quantization-design experiment behind the r15 recall work: the r14
  * audit showed exhaustive-ADC recall@10 = 0.276 — PQ quantization
  * error, not probe starvation, dominates every nProbe setting. This
  * tool measures the candidate cures on the REAL corpus before the
  * engine commits to one: more subspaces (m 8 → 16: 4-dim subvectors
  * quantize far tighter at the same codebook budget), a bigger
  * codebook (every 40 → 20 doubles ksub), and an OPQ-style
  * deterministic rotation (normalized Hadamard × md5-derived ±1
  * diagonal — an isometry, so ground truth is unchanged, but the
  * subspace split stops aligning with raw coordinates).
  *
  * Reports exhaustive-ADC recall@10 (nProbe = all cells) per variant —
  * the quantizer's own ceiling with probing removed.
  *
  * Usage: runMain graft.tools.PqTune [sfDir] [k] [nQueries]
  */
object PqTune {

  /** Deterministic orthogonal rotation R = H·D: normalized Hadamard
    * (entry (-1)^popcount(i&j) / √d) times an md5-seeded ±1 diagonal.
    * Orthogonal by construction (HᵀH = I, D² = I), so distances are
    * preserved exactly and GT is rotation-invariant.
    */
  def rotationMatrix(d: Int, seed: String): Array[Array[Double]] = {
    require((d & (d - 1)) == 0, s"Hadamard rotation needs d=2^k, got $d")
    val md = java.security.MessageDigest.getInstance("MD5")
    val signs = Array.tabulate(d) { j =>
      val h = md.digest(s"$seed:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
    val s = 1.0 / math.sqrt(d.toDouble)
    Array.tabulate(d, d) { (i, j) =>
      (if (Integer.bitCount(i & j) % 2 == 0) s else -s) * signs(j)
    }
  }

  /** Rotate an array column by `r` (declarative: one aggregate fold per
    * output dim — offline-encode cost, never a serve-path expression).
    */
  def rotateCol(vec: Column, r: Array[Array[Double]]): Column = {
    val rl = typedLit(r.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(r.length - 1)), i =>
      aggregate(zip_with(vec, element_at(rl, i + 1),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val e0 = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val rot = rotationMatrix(64, "graft-opq-r15")
    val eR = e0.select(col("vec_id"),
        rotateCol(col("embedding"), rot).as("embedding"))
      .localCheckpoint(true)

    val queryIds = e0.filter(pmod(col("vec_id"), lit(37)) === 1)
      .select(col("vec_id")).orderBy(col("vec_id")).limit(nQueries)
      .collect().map(_.getLong(0)).toSeq
    require(queryIds.nonEmpty, s"no query sample at $sfDir")

    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    // (label, data, m, every, iters)
    val variants: Seq[(String, DataFrame, Int, Int, Int)] = Seq(
      ("m8_e40_i2", e0, 8, 40, 2),
      ("m16_e40_i2", e0, 16, 40, 2),
      ("m8_e20_i2", e0, 8, 20, 2),
      ("m16_e20_i2", e0, 16, 20, 2),
      ("m16_e20_i3", e0, 16, 20, 3),
      ("m16_e40_i2_rot", eR, 16, 40, 2),
      ("m16_e20_i2_rot", eR, 16, 20, 2),
      ("m32_e20_i2", e0, 32, 20, 2),
      ("m32_e20_i2_rot", eR, 32, 20, 2))

    val out = variants.map { case (label, data, m, every, iters) =>
      val coarse = graft.queries.LlmOps.ivfCentroids(spark, sfDir, data)
      val nCells = coarse.count().toInt
      val books = ProductQuantizer.ivfPqTrainBooks(
        data, "vec_id", "embedding", m, coarse, every, iters)
        .localCheckpoint(true)
      val codes = ProductQuantizer.ivfPqEncodeWith(
        data, "vec_id", "embedding", m, coarse, books)
        .localCheckpoint(true)
      var rec = 0.0
      for (qid <- queryIds) {
        val query = data.filter(col("vec_id") === qid)
          .select(col("embedding")).limit(1)
        val corpusX = data.filter(col("vec_id") =!= qid)
        val q = query.select(col("embedding").as("qv"))
        val exactD = VectorFns.normSq(col("embedding")) -
          lit(2.0) * VectorFns.dot(col("embedding"), col("qv")) +
          VectorFns.normSq(col("qv"))
        val gt = ids(corpusX.crossJoin(broadcast(q))
          .select(col("vec_id"), exactD.as("d"))
          .orderBy(col("d").asc, col("vec_id").asc).limit(k))
        val got = ids(ProductQuantizer.ivfPqTopK(query, "embedding", m,
          coarse, books, codes.filter(col("vec_id") =!= qid),
          "vec_id", nProbe = nCells, k = k))
        rec += got.intersect(gt).size.toDouble / gt.size
      }
      val r = rec / queryIds.size
      System.err.println(f"[pqtune] $label%-18s recall@$k = $r%.4f")
      label -> r
    }
    val json = out.map { case (l, r) =>
      s"${graft.JsonText.quote(l)}:" + f"$r%.4f"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"pq_tune","k":$k,"n_queries":${queryIds.size},"variants":$json,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
