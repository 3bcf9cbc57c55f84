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
}
