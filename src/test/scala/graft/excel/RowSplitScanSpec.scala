package graft.excel

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.XlsxWriter
import graft.sources.excel.XlsxWriter._

/** Splittable single-sheet scan (SURVEY §7.4): `sheetPartitions = N`
  * splits ONE sheet into byte ranges of the inflated XML at `<row`
  * boundaries — pass 1 is a raw-byte substring scan for split points,
  * pass 2 parses only each range. The contract: a multi-partition read
  * equals the single-partition read, including global row order
  * (partition ordinal = byte-range order = document row order).
  */
class RowSplitScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bigSheet(nRows: Int): String = {
    val p = Files.createTempDirectory("split").resolve("big.xlsx").toString
    val rows = (1 to nRows).map { i =>
      Seq(Some(XNum(i)), Some(XStr(s"name_$i")),
        if (i % 7 == 0) None else Some(XNum(i * 1.25)),
        Some(XShared(s"cat${i % 13}")))
    }
    XlsxWriter.write(p, Seq(Sheet.dense("data",
      Seq("id", "name", "amount", "cat").map(h => Option(XShared(h): XCell))
        +: rows)))
    p
  }

  test("multi-partition read equals single-partition read, order preserved") {
    val path = bigSheet(20000)
    val whole = spark.read.format("excel").load(path)
      .collect().map(_.toSeq).toSeq
    val split = spark.read.format("excel")
      .option("sheetPartitions", "7").load(path)
    assert(split.rdd.getNumPartitions == 7,
      s"expected 7 partitions, got ${split.rdd.getNumPartitions}")
    val got = split.collect().map(_.toSeq).toSeq
    assert(got.size == 20000)
    assert(got == whole, "split read must equal whole read in global order")
  }

  test("more partitions than rows degrades to fewer, still exact") {
    val path = bigSheet(5)
    val split = spark.read.format("excel")
      .option("sheetPartitions", "64").load(path)
    val got = split.collect().map(r => r.getString(0)).toSeq
    assert(got == (1 to 5).map(i => s"$i"))
  }

  test("column pruning composes with the split scan") {
    val path = bigSheet(3000)
    val pruned = spark.read.format("excel")
      .option("sheetPartitions", "4").load(path).select("cat", "id")
    assert(pruned.collect().map(_.getString(1)).toSeq ==
      (1 to 3000).map(i => s"$i"))
  }

  test("spillRowChunks: chunks are row-aligned and concatenate to the sheet tail") {
    val path = bigSheet(4000)
    val wb = new graft.sources.excel.XlsxParser.Workbook(path)
    try {
      val sheet = wb.resolveSheet(None, None)
      // rowSplits is the independent boundary oracle: the one-pass spill
      // must cut at byte-identical offsets
      val bounds = wb.rowSplits(sheet.target, 6)
      assert(bounds.size == 6)
      val scratch = Files.createTempDirectory("spill")
      val chunks = wb.spillRowChunks(sheet.target, 6, scratch)
      assert(chunks.size == 6)
      val bodies = chunks.map(c => Files.readAllBytes(java.nio.file.Paths.get(c)))
      // every chunk starts exactly at a <row element
      bodies.foreach { b =>
        assert(new String(b, 0, 4, "UTF-8") == "<row", "chunk must start at <row")
      }
      // sizes match the planned ranges (last range runs to end of part)
      bounds.zip(bodies).dropRight(1).foreach { case ((a, e), b) =>
        assert(b.length.toLong == e - a, s"chunk length ${b.length} != range ${e - a}")
      }
      // chunks concatenate to the inflated sheet XML from the first row on
      val zf = new java.util.zip.ZipFile(path)
      val whole =
        try zf.getInputStream(zf.getEntry(sheet.target)).readAllBytes()
        finally zf.close()
      val tail = java.util.Arrays.copyOfRange(whole, bounds.head._1.toInt, whole.length)
      assert(java.util.Arrays.equals(bodies.reduce(_ ++ _), tail),
        "concatenated chunks must equal the sheet XML from the first row")
    } finally wb.close()
  }

  test("high partition count stays exact (spill removes the quadratic prefix cost)") {
    val path = bigSheet(20000)
    // pre-spill, 64 partitions would have paid ~32x the sheet in redundant
    // inflate; now planning inflates twice total, so large N is safe.
    val split = spark.read.format("excel")
      .option("sheetPartitions", "64").load(path)
    assert(split.rdd.getNumPartitions == 64)
    assert(split.count() == 20000)
    assert(split.select("id").collect().map(_.getString(0)).toSeq ==
      (1 to 20000).map(i => s"$i"))
  }

  test("xlsb: multi-partition read equals single-partition read, order preserved") {
    // BIFF12 row headers always carry absolute row ids, so the split
    // path needs no r=-style precondition: the planner walks the
    // length-prefixed record stream once and spills row-aligned chunks
    val p = Files.createTempDirectory("splitb").resolve("big.xlsb").toString
    val rows = (1 to 8000).map { i =>
      Seq(Some(XNum(i)), Some(XShared(s"name_$i")),
        if (i % 7 == 0) None else Some(XNum(i * 1.25)),
        Some(XShared(s"cat${i % 13}")))
    }
    graft.sources.excel.XlsbWriter.write(p, Seq(Sheet.dense("data",
      Seq("id", "name", "amount", "cat").map(h => Option(XShared(h): XCell))
        +: rows)))
    val whole = spark.read.format("excel").load(p)
      .collect().map(_.toSeq).toSeq
    val split = spark.read.format("excel")
      .option("sheetPartitions", "5").load(p)
    assert(split.rdd.getNumPartitions == 5,
      s"expected 5 partitions, got ${split.rdd.getNumPartitions}")
    val got = split.collect().map(_.toSeq).toSeq
    assert(got.size == 8000)
    assert(got == whole, "xlsb split read must equal whole read in global order")
  }

  test("fallback to a serial scan logs a loud warning") {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val appender = new AbstractAppender(
      "split-warn-capture", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit =
        captured.add(event.getMessage.getFormattedMessage)
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val loggerName = classOf[graft.sources.excel.ExcelScan].getName
    val lc = cfg.getLoggerConfig(loggerName)
    lc.addAppender(appender, Level.WARN, null)
    try {
      // two workbooks under one directory: multi-file scans can't split a
      // single sheet, so sheetPartitions must degrade loudly, not silently
      val dir = Files.createTempDirectory("multi")
      val rows = (1 to 3).map(i => Seq(Option(XNum(i): XCell)))
      for (f <- Seq("a.xlsx", "b.xlsx"))
        XlsxWriter.write(dir.resolve(f).toString, Seq(Sheet.dense("s",
          Seq(Option(XShared("id"): XCell)) +: rows)))
      val df = spark.read.format("excel")
        .option("sheetPartitions", "4").load(dir.toString)
      assert(df.count() == 6)
      assert(captured.asScala.exists(m =>
        m.contains("sheetPartitions=4 ignored") && m.contains("2 paths")),
        s"expected a fallback warning, got: ${captured.asScala.mkString(" | ")}")
    } finally {
      lc.removeAppender("split-warn-capture")
      appender.stop()
    }
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
