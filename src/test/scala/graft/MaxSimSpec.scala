package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q98 — late-interaction MaxSim rerank. The load-bearing check is an
  * INDEPENDENT in-process replica: plain Scala recomputes the whole
  * pipeline (tokenize → md5 feature hash → chunk vectors → pooled
  * stage-1 top-m → true MaxSim over every (doc chunk, query chunk)
  * pair → top-k) from the raw documents, and the query's top-10 must
  * match it (doc_id, maxsim) exactly — everything is integer, so
  * there is no tolerance to hide behind. In particular this pins the
  * classic relational MaxSim bug: a (qchunk, dchunk) pair with no
  * shared feature bucket is a TRUE dot-0 pair, and a qchunk whose
  * overlapping dots are all negative must max against that 0 — the
  * replica computes dense dots, so dropping the pair frame in the
  * query would diverge here.
  */
class MaxSimSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** chunk → bucket → signed count; Spark split(text, " ") keeps
    * trailing empties, so the replica must too (split limit -1).
    */
  private def chunkVecs(text: String): Map[Long, Map[Int, Long]] =
    text.split(" ", -1).zipWithIndex
      .groupBy { case (_, i) => (i / 32).toLong }
      .map { case (chunk, toks) =>
        chunk -> toks.map { case (w, _) =>
          val h = md5hex(w)
          val bucket = Integer.parseInt(h.substring(0, 1), 16)
          val sgn = if (Integer.parseInt(h.substring(1, 2), 16) < 8) 1L
            else -1L
          bucket -> sgn
        }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      }

  private def dot(a: Map[Int, Long], b: Map[Int, Long]): Long =
    a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum

  test("q98_maxsim_rerank matches an independent in-process replica " +
      "exactly (integer scores, no tolerance)") {
    val got = SparkEntry.queries("q98_maxsim_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qid = docs.keys.min
    val vecs = docs.map { case (id, text) => id -> chunkVecs(text) }
    def pooled(id: Long): Map[Int, Long] =
      vecs(id).values.flatten.groupBy(_._1)
        .map { case (b, xs) => b -> xs.map(_._2).sum }
    val qpool = pooled(qid)
    // stage 1 mirrors the relational form: docs sharing >= 1 pooled
    // bucket with the query, scored over the shared buckets
    val cands = docs.keys.filter(_ != qid).toSeq
      .flatMap { id =>
        val p = pooled(id)
        if (p.keySet.intersect(qpool.keySet).isEmpty) None
        else Some(id -> dot(p, qpool))
      }
      .sortBy { case (id, s1) => (-s1, id) }
      .take(50).map(_._1)
    val qchunks = vecs(qid).values.toSeq
    val expected = cands.map { id =>
      val ms = qchunks.map(qc =>
        vecs(id).values.map(dc => dot(dc, qc)).max).sum
      (id, ms)
    }.sortBy { case (id, ms) => (-ms, id) }.take(10)

    assert(got == expected,
      s"engine top-10 $got must equal the replica's $expected")
    assert(!got.exists(_._1 == qid), "the query doc must be excluded")
    assert(got.size == math.min(10, cands.size))
  }
}
