package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q98 over randomized corpora: the engine must match the
  * [[MaxSimReplica]] INTEGER-EXACTLY on seeded random documents that
  * deliberately include the tokenization edge cases the sf fixtures
  * may not exercise — empty texts (one empty token), double spaces
  * (interior empty tokens), trailing spaces (trailing empty token,
  * which Spark's split keeps), single-token docs, and docs long
  * enough to span several 32-token chunks. Each trial writes its
  * corpus as a real parquet table and runs the REGISTERED query
  * against it, so the whole declared pipeline is under test, not a
  * re-implementation.
  */
class MaxSimPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "x", "yy", "zzz", "")

  private def randomText(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(90)
    if (n == 0) ""
    else {
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // trailing space in ~1/4 of docs: Spark split keeps the
      // resulting trailing empty token, and so must the replica
      if (rnd.nextInt(4) == 0) body + " " else body
    }
  }

  test("q98_maxsim_rerank matches the replica on seeded random corpora " +
      "with tokenization edge cases") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(1234 + trial)
      val docs = (0L until (30 + rnd.nextInt(40)).toLong)
        .map(id => id -> randomText(rnd)).toMap
      val dir = graft.RunPaths.scratch(s"graft_maxsim_prop_$trial")
      docs.toSeq.sortBy(_._1).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q98_maxsim_rerank")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = MaxSimReplica.topK(docs)
      assert(got == expected,
        s"trial $trial: engine $got != replica $expected")
    }
  }
}
