package graft.excel

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.{XlsbWriter, XlsxWriter}
import graft.sources.excel.XlsxWriter._

/** Golden tests for the xlsb (BIFF12) decoder: same fixture definitions
  * as the xlsx suite, written in binary form; the key invariant is that
  * both formats of the same logical sheet convert to IDENTICAL results.
  */
class XlsbSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String =
    Files.createTempDirectory("xlsb-spec").resolve(name).toString

  private def readExcel(path: String, opts: (String, String)*) = {
    var r = spark.read.format("excel")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
  }

  test("basic xlsb scan with header, RK ints and doubles") {
    val path = tmp("basic.xlsb")
    XlsbWriter.write(path, Seq(Sheet.dense("Sheet1",
      Seq(Some(XShared("id")), Some(XShared("name")), Some(XShared("amount"))) +:
        (1 to 10).map(i => Seq(
          Some(XNum(i)), Some(XStr(s"row$i")), Some(XNum(i * 1.5)))))))
    val df = readExcel(path)
    assert(df.columns.toSeq == Seq("id", "name", "amount"))
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.head == Row("1", "row1", "1.5"))
    assert(rows(1) == Row("2", "row2", "3"))  // RK int & integral double
  }

  test("cell type variants decode with xlsx-identical strings") {
    val fixture = Sheet.dense("S",
      Seq(
        (1 to 8).map(i => Option(XShared(s"c$i"): XCell)),
        Seq(
          Some(XNum(42)),                 // RK int
          Some(XNum(123456789012.75)),    // BrtCellReal
          Some(XNum(-0.5)),               // negative double
          Some(XStr("inline")),
          Some(XShared("shared")),
          Some(XBool(true)),
          Some(XErr("#DIV/0!")),
          Some(XEmpty))))
    val xlsb = tmp("types.xlsb"); val xlsx = tmp("types.xlsx")
    XlsbWriter.write(xlsb, Seq(fixture))
    XlsxWriter.write(xlsx, Seq(fixture))
    val a = readExcel(xlsb).collect().toSeq
    val b = readExcel(xlsx).collect().toSeq
    assert(a == b, s"xlsb=$a xlsx=$b")
    assert(a.head == Row("42", "123456789012.75", "-0.5", "inline", "shared", "true", "Div0", ""))
  }

  test("sparse semantics: null vs empty vs dropped rows (format parity)") {
    val fixture = Sheet("S", Map(
      (0, 0) -> XShared("a"), (0, 1) -> XShared("b"), (0, 2) -> XShared("c"),
      (1, 0) -> XNum(1), (1, 1) -> XNum(2), (1, 2) -> XNum(3),
      (3, 0) -> XNum(4), (3, 2) -> XEmpty))
    val xlsb = tmp("sparse.xlsb"); val xlsx = tmp("sparse.xlsx")
    XlsbWriter.write(xlsb, Seq(fixture))
    XlsxWriter.write(xlsx, Seq(fixture))
    val a = readExcel(xlsb).collect().toSeq
    assert(a == readExcel(xlsx).collect().toSeq)
    assert(a == Seq(Row("1", "2", "3"), Row("4", null, "")))
  }

  test("multisheet selection + skipRows work through the binary path") {
    val path = tmp("multi.xlsb")
    def sheet(n: String, w: Int) = Sheet.dense(n,
      Seq((1 to w).map(i => Option(XShared(s"${n}_c$i"): XCell)),
        (1 to w).map(i => Option(XNum(i): XCell))))
    XlsbWriter.write(path, Seq(sheet("alpha", 2), sheet("beta", 3)))
    assert(readExcel(path).columns.toSeq == Seq("alpha_c1", "alpha_c2"))
    assert(readExcel(path, "sheetName" -> "beta").columns.length == 3)
    assert(readExcel(path, "sheetIndex" -> "1").columns.length == 3)
    val skipped = tmp("skip.xlsb")
    XlsbWriter.write(skipped, Seq(Sheet("S", Map(
      (0, 0) -> XStr("junk"),
      (1, 0) -> XShared("k"), (1, 1) -> XShared("v"),
      (2, 0) -> XNum(1), (2, 1) -> XNum(10)))))
    val df = readExcel(skipped, "skipRows" -> "1")
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.collect().toSeq == Seq(Row("1", "10")))
  }

  test("end-to-end xlsb -> parquet conversion via ExcelToParquet") {
    val xlsb = tmp("conv.xlsb")
    val out = tmp("conv.parquet")
    XlsbWriter.write(xlsb, Seq(Sheet.dense("S",
      Seq(Some(XShared("id")), Some(XShared("v"))) +:
        (1 to 50).map(i => Seq(Some(XNum(i)), Some(XNum(i * 0.25)))))))
    val rows = graft.ExcelToParquet.convert(spark,
      graft.ExcelToParquet.Options(xlsb, out))
    assert(rows == 50)
    val back = spark.read.parquet(out)
    assert(back.orderBy(back("id").cast("int")).collect().head == Row("1", "0.25"))
  }
}
