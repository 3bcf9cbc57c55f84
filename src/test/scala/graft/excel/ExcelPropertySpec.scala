package graft.excel

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.{RustDouble, XlsbWriter, XlsxWriter}
import graft.sources.excel.XlsxWriter._

/** Property tests (SURVEY §5.2.1): random sparse cell grids are written as
  * BOTH xlsx and xlsb, read through the DSv2 source, and compared against
  * an independent in-memory model of the reference semantics (used-range
  * maths, header naming, blank-row drop, null-vs-"", skipRows).
  */
class ExcelPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Straight-line model of the reference conversion semantics. */
  private def model(cells: Map[(Int, Int), XCell], skipRows: Int): (Seq[String], Seq[Seq[Option[String]]]) = {
    if (cells.isEmpty) return (Seq("Field_0"), Seq.empty)
    def text(c: XCell): String = c match {
      case XNum(v)        => RustDouble.format(v)
      case XStr(s)        => s
      case XShared(s)     => s
      case XFormulaStr(s) => s
      case XBool(b)       => if (b) "true" else "false"
      case XErr(code)     => graft.sources.excel.XlsxParser.mapError(code)
      case XIsoDate(s)    => s
      case XEmpty         => ""
    }
    val rows = cells.keys.map(_._1)
    val cols = cells.keys.map(_._2)
    val (r0, c0, c1) = (rows.min, cols.min, cols.max)
    val width = c1 - c0 + 1
    val headerRow = r0 + skipRows
    val headerCells = cells.collect { case ((r, c), v) if r == headerRow => (c, text(v)) }
    val names = graft.sources.excel.HeaderNames.build(
      (0 until width).map(i => headerCells.get(c0 + i).filter(_.nonEmpty)))
    val dataRows = cells.keys.map(_._1).filter(_ > headerRow).toSeq.distinct.sorted
    val data = dataRows.map { r =>
      (0 until width).map(i => cells.get((r, c0 + i)).map(text))
    }
    (names, data)
  }

  private def randomGrid(rnd: scala.util.Random): Map[(Int, Int), XCell] = {
    val nRows = 1 + rnd.nextInt(8)
    val nCols = 1 + rnd.nextInt(6)
    val r0 = rnd.nextInt(3)
    val c0 = rnd.nextInt(3)
    val cellGen: Int => XCell = i => rnd.nextInt(7) match {
      case 0 => XNum(rnd.nextInt(1000))
      case 1 => XNum(rnd.nextDouble() * 100 - 50)
      case 2 => XStr(s"s${rnd.nextInt(5)}")
      case 3 => XShared(s"sh${rnd.nextInt(3)}")
      case 4 => XBool(rnd.nextBoolean())
      case 5 => XErr("#DIV/0!")
      case 6 => XEmpty
    }
    val header = (0 until nCols).flatMap { c =>
      // ~20% blank header cells, some duplicate names
      if (rnd.nextDouble() < 0.2) None
      else Some((r0, c0 + c) -> (XShared(s"h${rnd.nextInt(4)}"): XCell))
    }
    val data = for {
      r <- 1 to nRows
      c <- 0 until nCols
      if rnd.nextDouble() < 0.7 // sparse: ~30% absent cells
    } yield (r0 + r, c0 + c) -> cellGen(c)
    // ensure the header row has at least one cell so the used range starts there
    val anchor = Seq((r0, c0) -> (XShared("anchor"): XCell))
    (header ++ data ++ anchor).toMap
  }

  test("random sparse grids: xlsx and xlsb both match the reference model") {
    val rnd = new scala.util.Random(20260812)
    val dir = Files.createTempDirectory("prop")
    (1 to 25).foreach { trial =>
      val grid = randomGrid(rnd)
      val (wantNames, wantRows) = model(grid, skipRows = 0)
      Seq("xlsx", "xlsb").foreach { fmt =>
        val path = dir.resolve(s"t$trial.$fmt").toString
        if (fmt == "xlsx") XlsxWriter.write(path, Seq(Sheet("s", grid)))
        else XlsbWriter.write(path, Seq(Sheet("s", grid)))
        val df = spark.read.format("excel").load(path)
        assert(df.columns.toSeq == wantNames, s"trial $trial $fmt names grid=$grid")
        val got = df.collect().map(r =>
          (0 until r.length).map(i => Option(r.getString(i))))
        assert(got.length == wantRows.length, s"trial $trial $fmt rowcount grid=$grid")
        got.zip(wantRows).zipWithIndex.foreach { case ((g, w), i) =>
          assert(g == w, s"trial $trial $fmt row $i grid=$grid")
        }
      }
    }
  }

  test("split-scan property: any sheetPartitions equals the serial read, both formats") {
    // the round-8 chunk-spill planner must be invisible: for random
    // sparse grids (small → serial fallback and degraded chunk counts;
    // large → real multi-chunk splits) and arbitrary partition counts,
    // the split read must equal the serial read row for row, in order
    val rnd = new scala.util.Random(20260814)
    val dir = Files.createTempDirectory("propsplit")
    (1 to 12).foreach { trial =>
      val grid =
        if (trial <= 6) randomGrid(rnd)
        else { // larger sheets that genuinely split
          val nRows = 100 + rnd.nextInt(300)
          val base = randomGrid(rnd)
          val wide = for {
            r <- 1 to nRows
            c <- 0 until 4
            if rnd.nextDouble() < 0.8
          } yield (1 + r, c) -> (XStr(s"v${r}_$c"): XCell)
          (base.map { case ((r, c), v) => (r.min(0), c) -> v } // header band
            ++ wide ++ Seq((0, 0) -> (XShared("anchor"): XCell))).toMap
        }
      val parts = Seq(2, 3, 5, 9, 64)(rnd.nextInt(5))
      Seq("xlsx", "xlsb").foreach { fmt =>
        val path = dir.resolve(s"t$trial.$fmt").toString
        if (fmt == "xlsx") XlsxWriter.write(path, Seq(Sheet("s", grid)))
        else XlsbWriter.write(path, Seq(Sheet("s", grid)))
        val serial = spark.read.format("excel").load(path)
          .collect().map(_.toSeq).toSeq
        val split = spark.read.format("excel")
          .option("sheetPartitions", parts.toString).load(path)
          .collect().map(_.toSeq).toSeq
        assert(split == serial,
          s"trial $trial $fmt parts=$parts: split read diverged from serial")
      }
    }
  }

  test("skipRows property: model agreement for offsets 0..2") {
    val rnd = new scala.util.Random(7)
    val dir = Files.createTempDirectory("propskip")
    (1 to 10).foreach { trial =>
      val grid = randomGrid(rnd)
      val maxRow = grid.keys.map(_._1).max
      val minRow = grid.keys.map(_._1).min
      (0 to math.min(2, maxRow - minRow)).foreach { skip =>
        val (wantNames, wantRows) = model(grid, skip)
        val path = dir.resolve(s"t${trial}_$skip.xlsx").toString
        XlsxWriter.write(path, Seq(Sheet("s", grid)))
        val df = spark.read.format("excel").option("skipRows", skip.toString).load(path)
        assert(df.columns.toSeq == wantNames, s"trial $trial skip=$skip")
        assert(df.count() == wantRows.length, s"trial $trial skip=$skip")
      }
    }
  }
}
