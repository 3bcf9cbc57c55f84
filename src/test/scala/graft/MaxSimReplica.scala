package graft

import java.security.MessageDigest

/** Independent in-process replica of the q98 MaxSim pipeline —
  * deliberately plain Scala collections so it shares NO code (and no
  * execution engine) with the query it checks. Used by MaxSimSpec
  * (fixture corpus) and MaxSimPropertySpec (randomized corpora with
  * tokenization edge cases).
  */
object MaxSimReplica {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** chunk → bucket → signed count; Spark split(text, " ") keeps
    * trailing empties, so the replica must too (split limit -1).
    */
  def chunkVecs(text: String): Map[Long, Map[Int, Long]] =
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

  def dot(a: Map[Int, Long], b: Map[Int, Long]): Long =
    a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum

  /** The full two-stage pipeline: pooled stage-1 top-m (relational
    * semantics — only docs sharing ≥ 1 pooled bucket with the query
    * are candidates), true MaxSim over every chunk pair, top-k by
    * (maxsim DESC, doc_id ASC).
    */
  def topK(docs: Map[Long, String], m: Int = 50, k: Int = 10)
      : Seq[(Long, Long)] = {
    val qid = docs.keys.min
    val vecs = docs.map { case (id, text) => id -> chunkVecs(text) }
    def pooled(id: Long): Map[Int, Long] =
      vecs(id).values.flatten.groupBy(_._1)
        .map { case (b, xs) => b -> xs.map(_._2).sum }
    val qpool = pooled(qid)
    val cands = docs.keys.filter(_ != qid).toSeq
      .flatMap { id =>
        val p = pooled(id)
        if (p.keySet.intersect(qpool.keySet).isEmpty) None
        else Some(id -> dot(p, qpool))
      }
      .sortBy { case (id, s1) => (-s1, id) }
      .take(m).map(_._1)
    val qchunks = vecs(qid).values.toSeq
    cands.map { id =>
      val ms = qchunks.map(qc =>
        vecs(id).values.map(dc => dot(dc, qc)).max).sum
      (id, ms)
    }.sortBy { case (id, ms) => (-ms, id) }.take(k)
  }
}
