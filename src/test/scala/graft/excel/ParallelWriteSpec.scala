package graft.excel

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ExcelToParquet
import graft.sources.excel.XlsxWriter
import graft.sources.excel.XlsxWriter._

/** Order contract of the parallel encode path (`writePartitions > 1`):
  * range partitioning on the scan row id must reproduce the serial
  * writer's global row order under lexicographic part-file order — the
  * same guarantee the reference's reorder-buffer writer provides
  * (/root/reference/src/lib.rs:288-320).
  */
class ParallelWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("writePartitions > 1 preserves row order and splits the output") {
    val dir = Files.createTempDirectory("pwrite")
    val in = dir.resolve("big.xlsx").toString
    val n = 20000
    XlsxWriter.write(in, Seq(Sheet.dense("S",
      Seq(Some(XShared("seq")), Some(XShared("txt"))) +:
        (1 to n).map(i => Seq(Some(XNum(i)), Some(XStr(s"row$i")))))))

    val serialOut = dir.resolve("serial.parquet").toString
    val parallelOut = dir.resolve("parallel.parquet").toString
    assert(ExcelToParquet.convert(spark,
      ExcelToParquet.Options(in, serialOut)) == n)
    assert(ExcelToParquet.convert(spark,
      ExcelToParquet.Options(in, parallelOut, writePartitions = 4)) == n)

    // actually split into multiple part files
    val parts = Files.list(java.nio.file.Paths.get(parallelOut)).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(parts.length == 4)

    // Global order = lexicographic part-file order with rows ordered
    // within each file (a multi-file Spark read orders splits by SIZE,
    // so the check reads each part individually in name order — the
    // order a glob consumer like `read_parquet('out/*.parquet')` sees).
    val serial = spark.read.parquet(serialOut).collect().map(_.getString(0)).toSeq
    val par = spark.read.parquet(parts.sorted.head)
    assert(par.columns.toSeq == Seq("seq", "txt"))
    val concat = parts.sorted.toSeq.flatMap(p =>
      spark.read.parquet(p).collect().map(_.getString(0)))
    assert(concat == serial)
    assert(serial == (1 to n).map(_.toString))
  }
}
