package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property the oracle can't see: the streaming priority sample must
  * equal the batch top-k even when documents arrive across MANY
  * micro-batches in an order unrelated to priority — the k-row carried
  * sample plus per-batch top-k is a monoid fold, and this pins it.
  */
class StreamSampleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scrambled multi-micro-batch arrival equals the batch top-k") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val batchTruth = docs
      .select(col("doc_id"), col("n_chars"),
        graft.queries.Sampling.priorityCol(col("n_chars"), col("doc_id"))
          .as("priority"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(20).collect().map(_.toSeq).toSeq
    assert(batchTruth.size == 20)

    // 5 files keyed by a hash unrelated to priority → every micro-batch
    // holds a mix of high- and low-priority docs
    val splitDir = Files.createTempDirectory("graft_sample_split").toString
    docs.repartition(5, xxhash64(col("doc_id")))
      .write.mode("overwrite").parquet(splitDir)
    val schema = spark.read.parquet(splitDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val streamed = StreamOps.streamPrioritySampleFrom(spark, stream, 20)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batchTruth)
  }
}
