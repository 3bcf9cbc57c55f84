package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed batch perceptron must match a sequential in-memory
  * reference exactly (integer weights, epoch by epoch), be invariant to
  * partitioning, and honor the margin-0-is-a-mistake contract the SQL
  * oracle unrolls.
  */
class PerceptronSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Sequential reference: same batch update, plain Scala. */
  private def reference(
      docs: Seq[(Long, Long, Map[Long, Long])], // (doc_id, y, bucket->x)
      buckets: Int, epochs: Int): Perceptron.TrainResult = {
    val withBias = docs.map { case (id, y, f) =>
      (id, y, f.updated(Perceptron.BiasBucket, 1L))
    }
    var w = (Perceptron.BiasBucket until buckets.toLong).map(_ -> 0L).toMap
    val mistakes = collection.mutable.ArrayBuffer.empty[Long]
    def mis = withBias.filter { case (_, y, f) =>
      y * f.map { case (b, x) => w(b) * x }.sum <= 0
    }
    (1 to epochs).foreach { _ =>
      val m = mis
      mistakes += m.size.toLong
      m.foreach { case (_, y, f) =>
        f.foreach { case (b, x) => w = w.updated(b, w(b) + y * x) }
      }
    }
    Perceptron.TrainResult(w, mistakes.toSeq, mis.size.toLong)
  }

  /** 12 docs over 4 buckets: positives load buckets 0/1 heavily,
    * negatives 2/3, with overlap so convergence takes >1 epoch.
    */
  private val docs: Seq[(Long, Long, Map[Long, Long])] =
    (0 until 12).map { i =>
      val y = if (i % 2 == 0) 1L else -1L
      val heavy: Map[Long, Long] =
        if (y > 0) Map(0L -> (3L + i % 3), 1L -> 2L, 2L -> 1L)
        else Map(2L -> (3L + i % 3), 3L -> 2L, 0L -> 1L)
      (i.toLong, y, heavy)
    }

  private def featDf(parts: Int) = {
    import spark.implicits._
    docs.flatMap { case (id, y, f) =>
      f.toSeq.map { case (b, x) => (id, y, b, x) }
    }.toDF("doc_id", "y", "bucket", "x").repartition(parts)
  }

  test("matches the sequential reference epoch-for-epoch") {
    val got = Perceptron.train(featDf(4), buckets = 4, epochs = 4)
    val want = reference(docs, buckets = 4, epochs = 4)
    assert(got.weights === want.weights)
    assert(got.mistakes === want.mistakes)
    assert(got.finalErrors === want.finalErrors)
    // the signal is real: training reduced the error
    assert(got.finalErrors < got.mistakes.head)
  }

  test("weights are partitioning-invariant") {
    val a = Perceptron.train(featDf(1), buckets = 4, epochs = 3)
    val b = Perceptron.train(featDf(7), buckets = 4, epochs = 3)
    assert(a === b)
  }

  test("fold-expression serving equals the aggregate margins") {
    import spark.implicits._
    // real text through the real featurizer, incl. one positive label
    val textDocs = Seq(
      (1L, "alpha beta gamma alpha beta", 310L),
      (2L, "delta epsilon delta", 120L),
      (3L, "zeta eta theta iota kappa zeta zeta", 350L),
      (4L, "alpha", 5L)
    ).toDF("doc_id", "text", "n_chars")
    val feat = graft.queries.Classifier.perceptronFeatures(textDocs)
    val r = Perceptron.train(feat, buckets = 32, epochs = 2)
    val viaAgg = Perceptron.margins(Perceptron.withBias(feat), r.weights)
      .select(col("doc_id"), col("m")).as[(Long, Long)].collect().toMap
    val viaExpr = textDocs.select(col("doc_id"),
        Perceptron.marginExpr(col("text"), r.weights).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr === viaAgg)
  }

  test("native margin kernel equals the HOF fold on edge-case texts") {
    import spark.implicits._
    // empty text, leading/trailing/double spaces (empty tokens are
    // REAL tokens under split limit -1), non-ASCII multi-byte chars
    val texts = Seq(
      (1L, ""), (2L, " "), (3L, "a  b"), (4L, " lead"), (5L, "trail "),
      (6L, "héllo wörld"), (7L, "日本語 テキスト と spaces"),
      (8L, "plain old text row"), (9L, "  "), (10L, "émoji 🙂 end")
    ).toDF("doc_id", "text")
    val w: Map[Long, Long] =
      ((-1L until 32L).map(b => b -> (b * 37 - 11))).toMap
    val kernel = texts.select(col("doc_id"),
        Perceptron.marginExpr(col("text"), w).as("m"))
      .as[(Long, Long)].collect().toMap
    val hof = texts.select(col("doc_id"),
        Perceptron.marginExprHof(col("text"), w).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(kernel === hof)
    // both derive the bucket count from the model, not a constant:
    // a 4-bucket model must agree too
    val w4: Map[Long, Long] = (-1L until 4L).map(b => b -> (b * 7 + 2)).toMap
    val k4 = texts.select(col("doc_id"),
        Perceptron.marginExpr(col("text"), w4).as("m"))
      .as[(Long, Long)].collect().toMap
    val h4 = texts.select(col("doc_id"),
        Perceptron.marginExprHof(col("text"), w4).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(k4 === h4)
  }

  test("epoch 1 updates on every doc (margin 0 counts as a mistake)") {
    val r = Perceptron.train(featDf(2), buckets = 4, epochs = 1)
    assert(r.mistakes === Seq(docs.size.toLong))
    // w1 = sum of y*x over ALL docs, bias = sum of y = 0 here
    val wantW = docs.flatMap { case (_, y, f) =>
      f.toSeq.map { case (b, x) => b -> y * x }
    }.groupBy(_._1).map { case (b, vs) => b -> vs.map(_._2).sum }
    wantW.foreach { case (b, v) => assert(r.weights(b) === v, s"bucket $b") }
    assert(r.weights(Perceptron.BiasBucket) === docs.map(_._2).sum)
  }
}
