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
}
