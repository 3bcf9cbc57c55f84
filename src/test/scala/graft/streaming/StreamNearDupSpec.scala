package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property the oracle can't see: streaming near-dup must produce the
  * batch LSH ground truth even when documents arrive across MANY
  * micro-batches, with bucket collisions spanning batch boundaries
  * (pair partners remembered in state, not co-arriving).
  */
class StreamNearDupSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("multi-micro-batch arrival equals the batch LSH pipeline") {
    val batchTruth = graft.queries.LlmOps
      .minhashVerifiedPairs(spark, sf, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchTruth.nonEmpty, "vacuous: no near-dup pairs at this sf")

    // split documents into 6 files and feed them one per micro-batch,
    // in a doc_id order that separates most duplicate partners
    val splitDir = Files.createTempDirectory("graft_neardup_split").toString
    graft.Tables.load(spark, sf, "documents")
      .repartition(6, col("doc_id"))
      .write.mode("overwrite").parquet(splitDir)
    val schema = spark.read.parquet(splitDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val streamed = StreamOps.streamNearDupFrom(spark, sf, stream)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batchTruth,
      s"missing ${(batchTruth -- streamed).size}, " +
        s"spurious ${(streamed -- batchTruth).size}")
  }

  test("a hot bucket saturates at maxBucket: bounded pairs, bounded state") {
    import spark.implicits._
    // 30 identical docs — every band bucket receives all 30. With
    // maxBucket=5, each bucket admits 5 members (sorted, so docs 1..5)
    // and emits exactly C(5,2)=10 pairs; the other 25 arrivals are
    // dropped without the quadratic 30*29/2 expansion. The exact-Jaccard
    // verifier keeps all of them (identical text → J=1), so the output
    // is precisely the pairs among the admitted five.
    val corpusDir = Files.createTempDirectory("graft_neardup_hot").toString
    val docs = (1 to 30).map(i => (i.toLong,
      "identical boilerplate content appearing in every single document"))
      .toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$corpusDir/documents.parquet")
    val schema = spark.read.parquet(s"$corpusDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(s"$corpusDir/documents.parquet")
    val pairs = StreamOps
      .streamNearDupFrom(spark, corpusDir, stream, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)).toSet
    assert(pairs == want, s"got $pairs")
  }
}
