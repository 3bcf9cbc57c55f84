package graft.excel

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ExcelToParquet
import graft.sources.excel.{XlsbWriter, XlsxWriter}
import graft.sources.excel.XlsxWriter._

class ConvertManySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("convertMany fans out mixed xlsx/xlsb jobs and reports per-file results") {
    val dir = Files.createTempDirectory("many")
    def fixture(n: Int) = Seq(Sheet.dense("s",
      Seq(Some(XShared("id")), Some(XShared("v"))) +:
        (1 to n).map(i => Seq(Some(XNum(i)), Some(XNum(i * 2))))))
    val jobs = (1 to 4).map { i =>
      val in = dir.resolve(s"f$i.${if (i % 2 == 0) "xlsb" else "xlsx"}").toString
      if (i % 2 == 0) XlsbWriter.write(in, fixture(i * 10))
      else XlsxWriter.write(in, fixture(i * 10))
      ExcelToParquet.Options(in, dir.resolve(s"out$i.parquet").toString)
    } :+ ExcelToParquet.Options(dir.resolve("missing.xlsx").toString,
      dir.resolve("outX.parquet").toString)

    val results = ExcelToParquet.convertMany(spark, jobs, parallelism = 4).toMap
    (1 to 4).foreach { i =>
      assert(results(jobs(i - 1).input) == Right(i * 10L))
    }
    assert(results(jobs(4).input).isLeft) // missing file -> error, not crash
  }
}
