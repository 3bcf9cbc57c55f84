package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec must round-trip PCM16 samples exactly, skip unknown
  * RIFF chunks per spec (with even padding), and refuse every
  * malformation class rather than mis-parse it.
  */
class WavCodecSpec extends AnyFunSuite {

  private val samples: Array[Short] =
    Array.tabulate(129)(i => ((i * 517) % 65536 - 32768).toShort)

  test("encode → decode round-trips rate and samples exactly") {
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 16000)
    val got = Multimodal.decodeWavPcm16(bytes)
    assert(got.isDefined)
    assert(got.get._1 === 16000)
    assert(got.get._2.toSeq === samples.toSeq)
  }

  test("unknown chunks are skipped, including odd-size even-padding") {
    val base = Multimodal.encodeWavPcm16(samples)
    // splice an unknown 5-byte LIST chunk (padded to 6) between fmt and data
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // RIFF size field must cover the new bytes
    val fixed = spliced.clone()
    val newSize = fixed.length - 8
    fixed(4) = (newSize & 0xff).toByte
    fixed(5) = ((newSize >> 8) & 0xff).toByte
    fixed(6) = ((newSize >> 16) & 0xff).toByte
    fixed(7) = ((newSize >> 24) & 0xff).toByte
    val got = Multimodal.decodeWavPcm16(fixed)
    assert(got.isDefined)
    assert(got.get._2.toSeq === samples.toSeq)
  }

  test("malformed inputs are refused, not mis-parsed") {
    val good = Multimodal.encodeWavPcm16(samples)
    assert(Multimodal.decodeWavPcm16(null) === None)
    assert(Multimodal.decodeWavPcm16(good.dropRight(1)) === None) // RIFF size mismatch
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Multimodal.decodeWavPcm16(badMagic) === None)
    val stereo = good.clone(); stereo(22) = 2
    assert(Multimodal.decodeWavPcm16(stereo) === None)
    val bits8 = good.clone(); bits8(34) = 8
    assert(Multimodal.decodeWavPcm16(bits8) === None)
    // data chunk claiming to overrun the file
    val overrun = good.clone()
    overrun(40) = ((samples.length * 2 + 2) & 0xff).toByte
    assert(Multimodal.decodeWavPcm16(overrun) === None)
    // ~2^31 chunk size must fail the bounds check, not wrap Int-negative
    // past it and crash the walker
    val hugeChunk = good.clone()
    hugeChunk(16) = 0xff.toByte; hugeChunk(17) = 0xff.toByte
    hugeChunk(18) = 0xff.toByte; hugeChunk(19) = 0x7f.toByte
    assert(Multimodal.decodeWavPcm16(hugeChunk) === None)
  }

  test("empty-but-valid WAV stays visible in the windowed feature table") {
    // a structurally valid file with a zero-sample data chunk must emit
    // one zero-sample row, not vanish — same accounting contract as the
    // malformed all-null row
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val empty = Multimodal.encodeWavPcm16(Array.empty[Short])
    assert(Multimodal.decodeWavPcm16(empty).exists(_._2.isEmpty))
    val assets = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, empty),
        org.apache.spark.sql.Row(2L, Multimodal.encodeWavPcm16(samples)),
        org.apache.spark.sql.Row(3L, Array[Byte](1, 2, 3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("asset_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType, nullable = true))))
    val rows = Multimodal.decodeWavWindows(assets, 64)
      .collect().groupBy(_.getLong(0))
    assert(rows(1L).toSeq.map(r => (r.getLong(1), r.getLong(2))) == Seq((0L, 0L)),
      "empty WAV must emit exactly one zero-sample window row")
    assert(rows(2L).length == (samples.length + 63) / 64)
    assert(rows(3L).head.isNullAt(1), "malformed payload keeps its all-null row")
  }
}
