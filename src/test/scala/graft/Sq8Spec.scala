package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScalarQuantizer
import graft.functions.VectorFns

/** q104_ann_sq8 — per-dimension byte quantization. Contracts:
  *
  *   - RECONSTRUCTION BOUND, the property that defines SQ8: every
  *     dequantized element is within span/512 of its source (half a
  *     quantization step — midpoint reconstruction), checked over the
  *     ENTIRE corpus, not a sample. This is what buys the fidelity
  *     ceiling a codebook can't offer.
  *   - RECALL: the SQ8 top-10 against exact squared-L2 ground truth.
  *     Every stage of the pipeline is deterministic (min/max model,
  *     closed-form codes), so the measured recall at a fixed dataset
  *     is a CONSTANT and can be asserted as a bound, not observed.
  *   - the registered query's plan property (shuffle-free serving) and
  *     structural shape.
  */
class Sq8Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("reconstruction bound: every dequantized element within " +
      "span/512 of its source, corpus-wide") {
    val corpus = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0)
    val (lo, hi) = ScalarQuantizer.train(corpus, "embedding")
    val codes = ScalarQuantizer.encode(corpus, "vec_id", "embedding", lo, hi)
    // decode each global code and compare against the source element:
    // dim = code / 256, byte = code % 256
    val loL = typedLit(lo.toSeq)
    val hiL = typedLit(hi.toSeq)
    val violated = corpus.select(col("vec_id"), col("embedding"))
      .join(codes, "vec_id")
      .select(col("vec_id"),
        zip_with(col("embedding"), col("codes"), (x, g) => {
          val dim = (g / 256L).cast("int")
          val c = (g % 256L).cast("double")
          val l = element_at(loL, dim + 1)
          val h = element_at(hiL, dim + 1)
          val dq = l + (c + lit(0.5)) * (h - l) / lit(256.0)
          val bound = (h - l) / lit(512.0) + lit(1e-12)
          (abs(x.cast("double") - dq) > bound).cast("int")
        }).as("viol"))
      .select(aggregate(col("viol"), lit(0), (a, v) => a + v).as("n"))
      .agg(sum(col("n")))
      .collect()(0).getLong(0)
    assert(violated == 0L,
      s"$violated elements dequantize outside the span/512 bound")
  }

  test("SQ8 recall@10 vs exact ground truth is high (deterministic " +
      "pipeline, asserted as a bound)") {
    val e = Tables.load(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") =!= 0)
    val (lo, hi) = ScalarQuantizer.train(corpus, "embedding")
    val codes = ScalarQuantizer.encode(corpus, "vec_id", "embedding",
      lo, hi).localCheckpoint(true)
    val queryIds = corpus.filter(pmod(col("vec_id"), lit(37)) === 1)
      .select(col("vec_id")).orderBy(col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(queryIds.nonEmpty)
    var hits = 0
    var total = 0
    for (qid <- queryIds) {
      val qv = e.filter(col("vec_id") === qid).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      val q = e.filter(col("vec_id") === qid)
        .select(col("embedding").as("qe"))
      val exactD = VectorFns.normSq(col("embedding")) -
        lit(2.0) * VectorFns.dot(col("embedding"), col("qe")) +
        VectorFns.normSq(col("qe"))
      val gt = corpus.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), exactD.as("d"))
        .orderBy(col("d").asc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      val lut = ScalarQuantizer.lutFor(qv, lo, hi)
      val got = codes.filter(col("vec_id") =!= qid)
        .withColumn("sqd",
          graft.functions.LutSumF(col("codes"), typedLit(lut.toSeq)))
        .orderBy(col("sqd").asc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      hits += got.intersect(gt).size
      total += gt.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.9,
      f"SQ8 recall@10 $recall%.3f below the 0.9 bound — byte " +
        "quantization should be near-lossless at this dimensionality")
  }

  test("registered q104_ann_sq8: 10 rows, finite, shuffle-free plan " +
      "require did not throw") {
    val rows = SparkEntry.queries("q104_ann_sq8")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => !r.isNullAt(1) && r.getDouble(1) >= 0.0))
    val d = rows.map(_.getDouble(1)).toSeq
    assert(d == d.sorted, "rows must come ranked by distance")
  }
}
