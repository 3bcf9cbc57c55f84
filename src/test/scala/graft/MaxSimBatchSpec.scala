package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q101_batch_maxsim — the batch MaxSim serve path. The correctness of
  * the VALUES is the driver's job (the whole batch output is
  * value-exact against DuckDB); what this spec pins is the property
  * value-exactness cannot see: BATCH INDEPENDENCE — a query's rows
  * are identical whatever else shares the batch (its probes, its
  * candidates, its MaxSim scores never read another query's state).
  * Violations would come from key-collision bugs in the qid-carrying
  * joins, exactly the class of bug a batched rewrite introduces.
  * Plus the structural basics on the registered query.
  */
class MaxSimBatchSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Residue class for the INDEPENDENCE property (8 queries — any qid
    * set is a valid maxSimServeBatch input, and Q solo contrast runs
    * keep the test cheap). The registered query's own set is the
    * mod-7/32 class — see [[registeredQids]].
    */
  private def qids(): Seq[Long] = {
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sf)
    spark.read.parquet(s"$ms/pooled")
      .select(col("doc_id")).distinct()
      .filter(pmod(col("doc_id"), lit(37)) === 1)
      .orderBy(col("doc_id")).limit(8)
      .collect().map(_.getLong(0)).toSeq
  }

  /** The registered q101 query table (r16: mod-7, Q=32 — the in-plan
    * probe ranking lifted the batch cap).
    */
  private def registeredQids(): Seq[Long] = {
    val ms = graft.queries.Semantic.ensureMaxSimServeLayout(spark, sf)
    spark.read.parquet(s"$ms/pooled")
      .select(col("doc_id")).distinct()
      .filter(pmod(col("doc_id"), lit(7)) === 1)
      .orderBy(col("doc_id")).limit(32)
      .collect().map(_.getLong(0)).toSeq
  }

  test("batch independence: each query's rows are identical served " +
      "alone or in the batch") {
    val qs = qids()
    assert(qs.size >= 2, s"need ≥2 queries for the property, got $qs")
    val batch = graft.queries.Semantic
      .maxSimServeBatch(spark, sf, qs, nProbe = 4, k = 10)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1))
          .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      }
    for (q <- qs) {
      val alone = graft.queries.Semantic
        .maxSimServeBatch(spark, sf, Seq(q), nProbe = 4, k = 10)
        .collect().sortBy(_.getInt(1))
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      assert(batch.getOrElse(q, Seq.empty) == alone,
        s"qid=$q: batch rows ${batch.get(q)} != solo rows $alone")
    }
  }

  test("registered query: per-query bounded, ranked, self-excluded") {
    val rows = SparkEntry.queries("q101_batch_maxsim")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    val reg = registeredQids()
    assert(reg.size >= 32, s"q101 must serve Q≥32, got ${reg.size}")
    assert(byQ.keySet == reg.toSet, "every query must be served")
    for ((q, rs) <- byQ) {
      assert(rs.length <= 10, s"qid=$q returned ${rs.length} rows")
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to rs.length), s"qid=$q ranks not contiguous")
      assert(!rs.exists(_.getLong(2) == q), s"qid=$q returned itself")
      val scores = rs.sortBy(_.getInt(1)).map(r => (r.getLong(3), r.getLong(2)))
      assert(scores.toSeq == scores.sortBy { case (m, id) => (-m, id) }.toSeq,
        s"qid=$q rows not in (maxsim desc, doc_id) order")
    }
  }
}
