package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, plus a partition-wise decode /
  * feature-extract operator.
  *
  * The Spark-side shape is real and load-bearing: schema, per-partition
  * batching (mapPartitions — the Scala analogue of mapInPandas), output
  * encoder, and the parquet round-trip. The CODEC itself is a clearly
  * marked deterministic stub — this container ships no image/audio
  * libraries, so `decodeStub` derives features from the raw bytes
  * (length, head byte, simple checksum); swapping in a real decoder
  * changes only the function body, not the distributed plumbing.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("w", IntegerType, nullable = true),
      StructField("h", IntegerType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("head_byte", LongType, nullable = true),
    StructField("byte_sum_mod", LongType, nullable = true)))

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation would decode the payload (image resize, audio
    * resample, frame sample) here — per partition, streaming, no
    * driver-side collection.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    if (payload == null || payload.isEmpty) (0L, -1L, 0L)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xffL; i += 1 }
      (payload.length.toLong, (payload(0) & 0xffL), sum % 256L)
    }
  }

  /** Partition-wise feature extraction over an asset DataFrame
    * (asset_id, payload, meta). One pass per partition; output rows
    * carry the extracted features.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (n, head, sum) = decodeStub(payload)
          Row(id, n, head, sum)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_len", LongType, nullable = false),
    StructField("head_byte", LongType, nullable = false)))

  /** Frame sampling: split each payload into `nFrames` contiguous byte
    * ranges ("frames") and emit one feature row per frame — the video
    * frame-sample / audio chunking shape. The STUB "decode" reports each
    * frame's length and first byte; a real codec would decode the slice.
    * mapPartitions + iterator flatMap: streaming per partition, output
    * fan-out nFrames×, no driver-side collection.
    */
  def sampleFrames(assets: DataFrame, nFrames: Int): DataFrame = {
    val enc = Encoders.row(frameSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val len = payload.length
          (0 until nFrames).iterator.map { f =>
            val start = f.toLong * len / nFrames
            val end = (f + 1).toLong * len / nFrames
            val head = if (end > start) payload(start.toInt) & 0xffL else -1L
            Row(id, f.toLong, end - start, head)
          }
        }
      }(enc)
  }

  val audioWindowSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("window_idx", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_amp", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  /** Audio-shaped feature extraction: treat the payload as a stream of
    * unsigned 8-bit samples, cut it into fixed non-overlapping windows,
    * and emit per-window amplitude statistics (count, sum, sum of
    * squares, peak) — the windowed-RMS/peak shape an audio pipeline
    * computes per clip. All-integer outputs, so results are exact and
    * hash-comparable (RMS itself is sqrt(sum_sq/n) — derived downstream
    * when needed, keeping the stored feature exact). A real
    * implementation swaps the byte stream for decoded PCM; the window
    * loop, schema, and partition-streaming shape are unchanged.
    */
  def audioWindows(assets: DataFrame, windowBytes: Int): DataFrame = {
    require(windowBytes > 0, "windowBytes must be positive")
    val enc = Encoders.row(audioWindowSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val nWin = (payload.length + windowBytes - 1) / windowBytes
          (0 until nWin).iterator.map { w =>
            val start = w * windowBytes
            val end = math.min(start + windowBytes, payload.length)
            var i = start; var sum = 0L; var sumSq = 0L; var peak = 0L
            while (i < end) {
              val v = payload(i) & 0xffL
              sum += v; sumSq += v * v; if (v > peak) peak = v
              i += 1
            }
            Row(id, w.toLong, (end - start).toLong, sum, sumSq, peak)
          }
        }
      }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("w", IntegerType, nullable = true),
      StructField("h", IntegerType, nullable = true))), nullable = true)))

  /** STUB resize: keep every `factor`-th byte — the payload→payload
    * transformation shape (image downscale, audio downsample) with the
    * metadata struct updated to the new "resolution". A real codec would
    * decode, resample, and re-encode the slice; the partition-wise
    * streaming, binary-in/binary-out encoder, and meta bookkeeping are
    * exactly what it would run on.
    */
  def resize(assets: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val enc = Encoders.row(resizedSchema)
    assets.select(col("asset_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val meta = if (r.isNullAt(2)) null else r.getStruct(2)
          val out =
            if (payload == null) null
            else Array.tabulate((payload.length + factor - 1) / factor)(i => payload(i * factor))
          val newMeta =
            if (meta == null) null
            else Row(meta.getString(0),
              if (meta.isNullAt(1)) null else Int.box((meta.getInt(1) + factor - 1) / factor),
              if (meta.isNullAt(2)) null else Int.box(meta.getInt(2)))
          Row(id, out, newMeta)
        }
      }(enc)
  }

  /** Build an asset table from documents (text payload stands in for a
    * real media payload) — used by q26 and the specs.
    */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("text/plain").as("mime"),
          col("n_chars").cast("int").as("w"),
          lit(0).as("h")).as("meta"))
}
