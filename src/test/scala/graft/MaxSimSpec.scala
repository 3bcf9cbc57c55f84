package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q98 — late-interaction MaxSim rerank. The load-bearing check is an
  * INDEPENDENT in-process replica ([[MaxSimReplica]]): plain Scala
  * recomputes the whole pipeline (tokenize → md5 feature hash → chunk
  * vectors → pooled stage-1 top-m → true MaxSim over every
  * (doc chunk, query chunk) pair → top-k) from the raw documents, and
  * the query's top-10 must match it (doc_id, maxsim) exactly —
  * everything is integer, so there is no tolerance to hide behind. In
  * particular this pins the classic relational MaxSim bug: a
  * (qchunk, dchunk) pair with no shared feature bucket is a TRUE
  * dot-0 pair, and a qchunk whose overlapping dots are all negative
  * must max against that 0 — the replica computes dense dots, so
  * dropping the pair frame in the query would diverge here.
  * MaxSimPropertySpec drives the same replica over randomized corpora
  * with tokenization edge cases.
  */
class MaxSimSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q98_maxsim_rerank matches an independent in-process replica " +
      "exactly (integer scores, no tolerance)") {
    val got = SparkEntry.queries("q98_maxsim_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = MaxSimReplica.topK(docs)
    val qid = docs.keys.min

    assert(got == expected,
      s"engine top-10 $got must equal the replica's $expected")
    assert(!got.exists(_._1 == qid), "the query doc must be excluded")
    assert(got.size == math.min(10, expected.size))
  }
}
