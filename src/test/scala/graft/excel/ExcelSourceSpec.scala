package graft.excel

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.XlsxWriter
import graft.sources.excel.XlsxWriter._

/** Golden end-to-end tests for the excel DSv2 source (FIXTURES.md §A). */
class ExcelSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String =
    Files.createTempDirectory("excel-spec").resolve(name).toString

  private def readExcel(path: String, opts: (String, String)*) = {
    var r = spark.read.format("excel")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
  }

  test("basic: happy path scan with header") {
    val path = tmp("basic.xlsx")
    XlsxWriter.write(path, Seq(Sheet.dense("Sheet1",
      Seq(Some(XShared("id")), Some(XShared("name")), Some(XShared("amount"))) +:
      (1 to 10).map(i => Seq(
        Some(XNum(i)), Some(XStr(s"row$i")), Some(XNum(i * 1.5)))))))
    val df = readExcel(path)
    assert(df.columns.toSeq == Seq("id", "name", "amount"))
    assert(df.schema.fields.forall(f => f.dataType.typeName == "string" && f.nullable))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 10)
    assert(rows.head == ("1", "row1", "1.5"))
    assert(rows(1) == ("2", "row2", "3"))   // 3.0 prints as "3" (Rust Display)
  }

  test("types: all cell_to_string variants") {
    val path = tmp("types.xlsx")
    XlsxWriter.write(path, Seq(Sheet.dense("S",
      Seq(
        (1 to 10).map(i => Option(XShared(s"c$i"): XCell)),
        Seq(
          Some(XNum(42)),              // int-valued float -> "42"
          Some(XNum(1.0)),             // "1", not "1.0"
          Some(XNum(1e300)),           // full positional expansion
          Some(XNum(-0.5)),            // "-0.5"
          Some(XStr("inline")),        // inline string
          Some(XShared("shared")),     // shared string
          Some(XBool(true)),           // "true"
          Some(XNum(45234.5)),         // date serial prints raw
          Some(XIsoDate("2024-01-15T10:30:00")), // ISO literal
          Some(XErr("#DIV/0!")))       // calamine Debug name
      ))))
    val r = readExcel(path).collect().head
    assert(r.getString(0) == "42")
    assert(r.getString(1) == "1")
    assert(r.getString(2).length == 301 && !r.getString(2).contains("e"))
    assert(r.getString(3) == "-0.5")
    assert(r.getString(4) == "inline")
    assert(r.getString(5) == "shared")
    assert(r.getString(6) == "true")
    assert(r.getString(7) == "45234.5")
    assert(r.getString(8) == "2024-01-15T10:30:00")
    assert(r.getString(9) == "Div0")
  }

  test("sparse: null vs empty-string vs dropped blank rows") {
    val path = tmp("sparse.xlsx")
    // row0: header a,b,c ; row1: full; row2 absent entirely; row3: cell b
    // missing (null), cell c explicitly empty ("")
    XlsxWriter.write(path, Seq(Sheet("S", Map(
      (0, 0) -> XShared("a"), (0, 1) -> XShared("b"), (0, 2) -> XShared("c"),
      (1, 0) -> XNum(1), (1, 1) -> XNum(2), (1, 2) -> XNum(3),
      (3, 0) -> XNum(4), (3, 2) -> XEmpty))))
    val rows = readExcel(path).collect()
    assert(rows.length == 2) // blank row 2 dropped, no padding
    assert(rows(0) == Row("1", "2", "3"))
    assert(rows(1) == Row("4", null, ""))  // absent -> null, empty -> ""
  }

  test("headers: Field_i, dedup, collision quirk") {
    val path = tmp("headers.xlsx")
    XlsxWriter.write(path, Seq(Sheet("S", Map(
      (0, 0) -> XShared("a"), (0, 2) -> XShared("a"),
      (0, 3) -> XShared("b"), (0, 4) -> XShared("a_2"),
      (1, 0) -> XNum(1), (1, 1) -> XNum(2), (1, 2) -> XNum(3),
      (1, 3) -> XNum(4), (1, 4) -> XNum(5)))))
    val df = readExcel(path)
    assert(df.columns.toSeq == Seq("a", "Field_1", "a_2", "b", "a_2_2"))
  }

  test("skiprows: header offset relative to used range not starting at A1") {
    val path = tmp("skiprows.xlsx")
    // used range starts at B3 (row2,col1); 2 junk rows; header at row4
    XlsxWriter.write(path, Seq(Sheet("S", Map(
      (2, 1) -> XStr("junk1"),
      (3, 1) -> XStr("junk2"), (3, 2) -> XStr("junkX"),
      (4, 1) -> XShared("k"), (4, 2) -> XShared("v"),
      (5, 1) -> XNum(1), (5, 2) -> XNum(10),
      (6, 1) -> XNum(2), (6, 2) -> XNum(20)))))
    val df = readExcel(path, "skipRows" -> "2")
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.collect().toSeq == Seq(Row("1", "10"), Row("2", "20")))
  }

  test("multisheet: selection by name, index, default-first; name wins; OOB errors") {
    val path = tmp("multi.xlsx")
    def sheet(n: String, w: Int) = Sheet.dense(n,
      Seq((1 to w).map(i => Option(XShared(s"${n}_c$i"): XCell)),
          (1 to w).map(i => Option(XNum(i): XCell))))
    XlsxWriter.write(path, Seq(sheet("alpha", 2), sheet("beta", 3), sheet("gamma", 1)))
    assert(readExcel(path).columns.toSeq == Seq("alpha_c1", "alpha_c2"))
    assert(readExcel(path, "sheetIndex" -> "1").columns.toSeq == Seq("beta_c1", "beta_c2", "beta_c3"))
    assert(readExcel(path, "sheetName" -> "gamma").columns.toSeq == Seq("gamma_c1"))
    // name wins over index
    assert(readExcel(path, "sheetName" -> "gamma", "sheetIndex" -> "0").columns.toSeq == Seq("gamma_c1"))
    val e = intercept[Exception] { readExcel(path, "sheetIndex" -> "9").schema }
    assert(e.getMessage.contains("out of bounds"))
  }

  test("headeronly: empty result with inferred schema (documented deviation)") {
    val path = tmp("headeronly.xlsx")
    XlsxWriter.write(path, Seq(Sheet.dense("S",
      Seq(Seq(Some(XShared("x")), Some(XShared("y")))))))
    val df = readExcel(path)
    assert(df.columns.toSeq == Seq("x", "y"))
    assert(df.count() == 0)
  }

  test("column pruning reaches the reader") {
    val path = tmp("prune.xlsx")
    XlsxWriter.write(path, Seq(Sheet.dense("S",
      Seq(Some(XShared("a")), Some(XShared("b")), Some(XShared("c"))) +:
      (1 to 5).map(i => Seq(Some(XNum(i)), Some(XNum(i * 2)), Some(XNum(i * 3)))))))
    val df = readExcel(path).select("b")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("2", "4", "6", "8", "10"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ExcelScan"))
  }

  test("wide_tall: order preservation across many rows") {
    val path = tmp("wide.xlsx")
    val n = 12000
    XlsxWriter.write(path, Seq(Sheet.dense("S",
      Seq(Some(XShared("seq")), Some(XShared("txt"))) +:
      (1 to n).map(i => Seq(Some(XNum(i)), Some(XStr(s"r$i")))))))
    val got = readExcel(path).collect()
    assert(got.length == n)
    assert(got.zipWithIndex.forall { case (r, i) => r.getString(0) == (i + 1).toString })
  }

  test("end-to-end convert to parquet matches reference semantics") {
    val xlsx = tmp("conv.xlsx")
    val out = tmp("conv.parquet")
    XlsxWriter.write(xlsx, Seq(Sheet.dense("S",
      Seq(Some(XShared("id")), Some(XShared("v"))) +:
      (1 to 100).map(i => Seq(Some(XNum(i)), Some(XNum(i * 0.5)))))))
    val rows = graft.ExcelToParquet.convert(spark,
      graft.ExcelToParquet.Options(xlsx, out))
    assert(rows == 100)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Seq("id", "v"))
    assert(back.schema.forall(_.dataType.typeName == "string"))
    assert(back.orderBy(back("id").cast("int")).collect().head == Row("1", "0.5"))
  }

  test("XML-special and non-ASCII text survives both formats") {
    val specials = Seq(
      "a & b < c > d \"quoted\" 'apostrophe'",
      "unicode: é ü 中文 русский",
      "emoji 😀 pair", // surrogate pair
      "tabs\tand  double  spaces",
      "&amp; literal-looking &#65; entities")
    def rows(vals: Seq[String]) =
      Seq(Some(XShared("k")), Some(XShared("txt"))) +:
        vals.zipWithIndex.map { case (v, i) =>
          Seq(Some(XNum(i + 1)), Some(XStr(v)): Option[XCell])
        }
    val xlsx = tmp("specials.xlsx")
    XlsxWriter.write(xlsx, Seq(Sheet.dense("S", rows(specials))))
    val gotX = spark.read.format("excel").load(xlsx)
      .orderBy(col("k").cast("int")).collect().map(_.getString(1)).toSeq
    assert(gotX == specials)
    val xlsb = tmp("specials.xlsb")
    graft.sources.excel.XlsbWriter.write(xlsb, Seq(Sheet.dense("S", rows(specials))))
    val gotB = spark.read.format("excel").load(xlsb)
      .orderBy(col("k").cast("int")).collect().map(_.getString(1)).toSeq
    assert(gotB == specials)
  }

  test("unknown extensions follow the CLI error contract") {
    val e = intercept[IllegalArgumentException] {
      graft.ExcelToParquet.convert(spark, graft.ExcelToParquet.Options("f.csv", "o"))
    }
    assert(e.getMessage.contains("Unsupported"))
  }

  test("headerDedup=reference: exact names when quirk-free, loud refusal when not") {
    // quirk-free duplicates: reference names == forced-unique names
    val ok = tmp("dupok.xlsx")
    XlsxWriter.write(ok, Seq(Sheet.dense("s",
      Seq(
        Seq(Some(XShared("a")), Some(XShared("a")), Some(XShared("b"))),
        Seq(Some(XNum(1)), Some(XNum(2)), Some(XNum(3)))))))
    val ref = readExcel(ok, "headerDedup" -> "reference")
    assert(ref.columns.toSeq == Seq("a", "a_2", "b"))
    assert(ref.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      == Seq(("1", "2", "3")))
    // the collision quirk would need duplicate column names -> refusal
    // at schema time (Spark cannot bind duplicate attributes), default
    // mode still reads the same workbook with forced-unique names
    val path = tmp("dup.xlsx")
    XlsxWriter.write(path, Seq(Sheet.dense("s",
      Seq(
        Seq(Some(XShared("a")), Some(XShared("a")), Some(XShared("a_2"))),
        Seq(Some(XNum(1)), Some(XNum(2)), Some(XNum(3)))))))
    assert(readExcel(path).columns.toSeq == Seq("a", "a_2", "a_2_2"))
    val e = intercept[Exception] {
      readExcel(path, "headerDedup" -> "reference").schema
    }
    assert(e.getMessage.contains("headerDedup=unique"), e.getMessage)
  }
}
