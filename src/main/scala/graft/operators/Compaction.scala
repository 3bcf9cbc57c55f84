package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a fragmented parquet directory into
  * size-targeted files.
  *
  * Long-running ingestion (streaming micro-batches, per-partition CDC
  * writes, over-parallel jobs) leaves behind directories of thousands of
  * tiny files; at 100 TB that means listing storms, per-file open costs,
  * and row groups too small for effective column encoding or min/max
  * skipping. Compaction bin-packs: measure the input's on-disk bytes from
  * the file system (no data scan), derive the output file count from a
  * target file size, and rewrite in one pass.
  *
  * The rewrite uses `coalesce`, not `repartition`: coalesce merges input
  * splits without a shuffle, so compaction costs one read + one write of
  * the data and nothing else. (A sorted/clustered layout is a different
  * operation — see ZOrder — and the two compose: compact first, cluster
  * when query patterns warrant the extra shuffle.)
  */
object Compaction {

  final case class Stats(filesBefore: Long, filesAfter: Long, bytes: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq
  }

  /** Compact `inDir` (parquet) into `outDir` targeting `targetFileBytes`
    * per output file. Returns before/after stats; row content is
    * preserved exactly (verified by the caller's oracle).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Stats = {
    val files = parquetFiles(spark, inDir)
    val totalBytes = files.map(_._2).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inDir)
      .coalesce(nOut)
      .write.mode("overwrite").option("compression", "zstd").parquet(outDir)
    Stats(files.size.toLong, parquetFiles(spark, outDir).size.toLong, totalBytes)
  }
}
