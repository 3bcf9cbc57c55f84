package graft.excel

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.XlsxWriter
import graft.sources.excel.XlsxWriter._

/** Multi-file excel scans: a directory (or glob) plans one partition per
  * workbook, rows keep per-file order with files in lexicographic order,
  * pruning still reaches the reader, and a file with a different header
  * fails loudly instead of misaligning columns positionally.
  */
class DirScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sheet(rows: Seq[Seq[Option[XCell]]]) =
    Seq(Sheet.dense("data",
      Seq(Some(XShared("k")), Some(XShared("v"))) +: rows))

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_dirscan")
    XlsxWriter.write(d.resolve("b.xlsx").toString, sheet(
      Seq(Seq(Some(XNum(3)), Some(XStr("three"))), Seq(Some(XNum(4)), Some(XStr("four"))))))
    XlsxWriter.write(d.resolve("a.xlsx").toString, sheet(
      Seq(Seq(Some(XNum(1)), Some(XStr("one"))), Seq(Some(XNum(2)), Some(XStr("two"))))))
    Files.write(d.resolve("ignore.txt"), "not a workbook".getBytes)
    d
  }

  test("directory scan unions all workbooks, one partition per file") {
    val df = spark.read.format("excel").load(dir.toString)
    assert(df.rdd.getNumPartitions == 2)
    // lexicographic file order: a.xlsx rows then b.xlsx rows
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "one"), ("2", "two"), ("3", "three"), ("4", "four")))
  }

  test("glob scan matches the same files") {
    val df = spark.read.format("excel").load(s"$dir/*.xlsx")
    assert(df.count() == 4)
    assert(df.select(col("k")).collect().map(_.getString(0)).toSeq ==
      Seq("1", "2", "3", "4"))
  }

  test("mismatched header across files fails loudly") {
    val d = Files.createTempDirectory("graft_dirscan_bad")
    XlsxWriter.write(d.resolve("a.xlsx").toString, sheet(
      Seq(Seq(Some(XNum(1)), Some(XStr("one"))))))
    XlsxWriter.write(d.resolve("z.xlsx").toString,
      Seq(Sheet.dense("data", Seq(
        Seq(Some(XShared("DIFFERENT")), Some(XShared("v"))),
        Seq(Some(XNum(9)), Some(XStr("nine")))))))
    val e = intercept[Exception] {
      spark.read.format("excel").load(d.toString).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("share the header"))),
      e.toString)
  }

  test("convert on a directory writes all rows through the parquet sink") {
    val out = Files.createTempDirectory("graft_dirconv").resolve("out.parquet")
    val n = graft.ExcelToParquet.convert(spark,
      graft.ExcelToParquet.Options(dir.toString, out.toString))
    assert(n == 4)
    assert(spark.read.parquet(out.toString)
      .collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3", "4"))
  }

  test("empty match is a clear error") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("excel").load(
        Paths.get(dir.toString, "nope_*.xlsx").toString).collect()
    }
    assert(e.getMessage.contains("no workbook files match"))
  }
}
