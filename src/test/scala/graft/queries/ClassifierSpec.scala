package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the q45 classifier-in-the-loop family,
  * independent of the DuckDB oracles: kNN majority-vote semantics
  * (including vote and similarity tie-breaks) and centroid arithmetic
  * on hand-built vectors.
  */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb(rows: (Long, Seq[Float], Int)*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("knnPredict recovers two clean clusters at k=3") {
    // two tight clusters on orthogonal axes, labels match the cluster
    val e = emb(
      (1L, Seq(1f, 0.01f), 0), (2L, Seq(1f, 0.02f), 0),
      (3L, Seq(1f, 0.03f), 0), (4L, Seq(1f, 0.04f), 0),
      (5L, Seq(0.01f, 1f), 1), (6L, Seq(0.02f, 1f), 1),
      (7L, Seq(0.03f, 1f), 1), (8L, Seq(0.04f, 1f), 1))
    val pred = Classifier.knnPredict(e, 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(pred.size == 8)
    assert(pred.forall { case (_, (label, p)) => label == p })
  }

  test("knnPredict majority vote breaks ties toward the smaller label") {
    // query 1 has exactly two neighbors of label 5 and two of label 3
    // at identical similarity → k=4 votes tie 2-2 → pred = 3
    val e = emb(
      (1L, Seq(1f, 1f), 9),
      (2L, Seq(1f, 0.9f), 5), (3L, Seq(0.9f, 1f), 5),
      (4L, Seq(1f, 0.8f), 3), (5L, Seq(0.8f, 1f), 3))
    val pred = Classifier.knnPredict(e, 4).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(pred(1L) == 3)
  }

  test("labelCentroids averages element-wise with 6-decimal rounding") {
    val e = emb(
      (1L, Seq(1f, 0f), 0), (2L, Seq(3f, 1f), 0),
      (3L, Seq(10f, 20f), 1))
    val got = Classifier.labelCentroids(e).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(0) == Seq(2.0, 0.5))
    assert(got(1) == Seq(10.0, 20.0))
  }

  test("calibrationCurve: hand-computed confusion counts and best-F1 pick") {
    import spark.implicits._
    // margins: positives at 10, 10, 5; negatives at 7, 2
    // threshold 10: tp=2 fp=0 fn=1 | 7: tp=2 fp=1 fn=1
    // threshold 5:  tp=3 fp=1 fn=0 | 2: tp=3 fp=2 fn=0
    val marg = Seq(
      (1L, 1L, 10L), (2L, 1L, 10L), (3L, 1L, 5L),
      (4L, -1L, 7L), (5L, -1L, 2L)
    ).toDF("doc_id", "y", "m")
    val rows = Classifier.calibrationCurve(marg).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows === Map(
      10L -> ((2L, 0L, 1L)), 7L -> ((2L, 1L, 1L)),
      5L -> ((3L, 1L, 0L)), 2L -> ((3L, 2L, 0L))))
    // f1: θ=10 → 4/5, θ=7 → 2/3, θ=5 → 6/7 (best), θ=2 → 3/4
    assert(Classifier.calibratedThreshold(marg) === 5L)
  }

  test("calibratedThreshold refuses an empty margin table loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_id", "y", "m")
    val e = intercept[IllegalArgumentException] {
      Classifier.calibratedThreshold(empty)
    }
    assert(e.getMessage.contains("no margins"))
  }
}
