package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The property q75's oracle can't see: the served result after streamed
  * tombstone deletes must be IDENTICAL under any micro-batch slicing of
  * the delete requests. Each slicing is compared (inside the query)
  * against a one-shot batch anti-join of the same id set, so equality of
  * the contract rows across slicings is transitively equality of the
  * served rows — without comparing model-dependent floats across two
  * independently trained indexes (k-means floats are not bit-stable
  * across executions; the contract row carries only deterministic counts
  * and booleans).
  */
class StreamIndexDeleteSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("served rows are invariant to delete-request slicing; raw serving " +
      "surfaces a tombstoned id") {
    val rows = Seq(2, 5).map { slices =>
      val r = StreamOps.streamIndexDeleteSliced(spark, sf, slices).collect()
      assert(r.length == 1, s"slices=$slices: expected one contract row")
      r.head
    }
    for ((row, slices) <- rows.zip(Seq(2, 5))) {
      assert(row.getAs[Boolean]("multi_trigger_ok"),
        s"slices=$slices: tombstones must land across >=2 generations")
      assert(row.getAs[Long]("n_results") == 10L,
        s"slices=$slices: serve must still return a full top-10")
      assert(row.getAs[Boolean]("deletes_visible_raw"),
        s"slices=$slices: negative control — raw serving (anti-join " +
          "removed) must surface a deleted id")
      assert(row.getAs[Boolean]("same_as_batch_delete"),
        s"slices=$slices: streamed tombstones must serve identically to " +
          "a one-shot batch delete")
    }
    assert(rows(0).toSeq == rows(1).toSeq,
      "contract row must be identical across slicings")
  }
}
