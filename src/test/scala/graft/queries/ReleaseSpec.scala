package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the q46 release-ops family, independent of the
  * DuckDB oracles: diff status classification on a hand-built pair of
  * snapshots, and OOV-rate arithmetic with a tiny learned vocabulary.
  */
class ReleaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("versionDiff classifies all four statuses") {
    import spark.implicits._
    // doc 1 unchanged, doc 2 changed, doc 3 removed, doc 4 added
    val old = Seq((1L, "s", "a"), (2L, "s", "b"), (3L, "s", "c"))
      .toDF("doc_id", "source", "fp_old")
    val neu = Seq((1L, "s", "a"), (2L, "s", "B"), (4L, "s", "d"))
      .toDF("doc_id", "source_new", "fp_new")
    val got = Release.versionDiff(old, neu).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("versionDiff takes source from whichever side has the doc") {
    import spark.implicits._
    val old = Seq((3L, "oldSrc", "c")).toDF("doc_id", "source", "fp_old")
    val neu = Seq((4L, "newSrc", "d")).toDF("doc_id", "source_new", "fp_new")
    val got = Release.versionDiff(old, neu).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("oldSrc", "removed"), ("newSrc", "added")))
  }

  test("oovRate counts tokens outside the learned top-N vocab") {
    import spark.implicits._
    // "a" ×3 and "b" ×2 make the top-2 vocab; "x"/"y" are OOV
    val tok = Seq(
      ("en", "a"), ("en", "a"), ("en", "b"), ("en", "x"),
      ("de", "a"), ("de", "b"), ("de", "y"), ("de", "y"))
      .toDF("lang", "word")
    val got = Release.oovRate(tok, 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("en") == ((4L, 1L, 0.25)))
    assert(got("de") == ((4L, 2L, 0.5)))
  }

  test("oovRate vocab tie-break prefers the lexicographically smaller word") {
    import spark.implicits._
    // "b" and "c" tie at 1; vocab of size 1 + the dominant "a" → only
    // "a" and (tie-break) "b" can be in a size-2 vocab
    val tok = Seq(("en", "a"), ("en", "a"), ("en", "b"), ("en", "c"))
      .toDF("lang", "word")
    val got = Release.oovRate(tok, 2).collect().head
    assert(got.getLong(1) == 4L && got.getLong(2) == 1L) // only "c" OOV
  }
}
