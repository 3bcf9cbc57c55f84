package graft.tools

import java.nio.file.Files

import graft.sources.excel.XlsxWriter
import graft.sources.excel.XlsxWriter._

/** Many-file split-scan rehearsal (VERDICT r10 task 3): measures what
  * the r11 lazy-spill redesign moved off the driver.
  *
  * Pre-r11, `planInputPartitions` serially inflated and spilled EVERY
  * workbook's sheet on the driver before any task launched — O(corpus)
  * planning wall-clock. Post-r11 the plan emits (file, chunkIndex)
  * intents; the inflate+spill happens in the first task that touches
  * each file, in parallel across files, overlapped with execution.
  *
  * Reported numbers:
  *   - plan_ms:        partition enumeration only (no tasks) — the
  *                     driver-side cost a caller pays before work starts
  *   - serial_spill_ms: chunksFor over all files SERIALLY on one thread
  *                     = what the pre-r11 planner paid at plan time
  *                     (measured on a fresh copy of the corpus so the
  *                     chunk cache cannot hide it)
  *   - first_count_ms: first action — includes the task-side parallel
  *                     spill of the original corpus
  *   - warm_count_ms:  second action — cache-hit steady state
  *
  * Usage: runMain graft.tools.SplitPlanRehearsal [nFiles] [rowsPerFile]
  */
object SplitPlanRehearsal {

  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toInt else 8
    val rowsPer = if (args.length > 1) args(1).toInt else 60000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def writeCorpus(tag: String): String = {
      val dir = Files.createTempDirectory(s"graft-splitplan-$tag")
      val header =
        Seq("id", "name", "amount", "cat").map(h => Option(XShared(h): XCell))
      (0 until nFiles).foreach { f =>
        val rows = (1 to rowsPer).map { i =>
          Seq(Some(XNum(i)), Some(XStr(s"f${f}_$i")),
            if (i % 7 == 0) None else Some(XNum(i * 1.25)),
            Some(XShared(s"cat${i % 13}")))
        }
        XlsxWriter.write(dir.resolve(f"wb$f%02d.xlsx").toString,
          Seq(Sheet.dense("data", header +: rows)))
      }
      dir.toString
    }

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

    // warm the source (codegen, classloading, schema-inference paths)
    // on a 1-row corpus so plan_ms measures ENUMERATION, not first-use
    // JVM costs
    val warmDir = Files.createTempDirectory("graft-splitplan-warm")
    XlsxWriter.write(warmDir.resolve("w.xlsx").toString,
      Seq(Sheet.dense("data", Seq(
        Seq(Option(XShared("id"): XCell)), Seq(Option(XNum(1): XCell))))))
    spark.read.format("excel").load(warmDir.toString).count()

    val dir = writeCorpus("main")
    val df = spark.read.format("excel")
      .option("sheetPartitions", "4")
      .option("maxSplitFiles", nFiles.toString)
      .load(dir)
    var t = System.nanoTime()
    val nParts = df.rdd.getNumPartitions
    val planMs = ms(t)

    // the pre-r11 equivalent: one thread spilling every file in plan
    // order — rehearsed on a COPY so the live corpus's cache stays cold
    val dir2 = writeCorpus("serial")
    t = System.nanoTime()
    new java.io.File(dir2).listFiles().map(_.getPath).sorted.foreach { p =>
      graft.sources.excel.ExcelScan.chunksFor(p, None, None, 4)
    }
    val serialSpillMs = ms(t)

    t = System.nanoTime()
    val n1 = df.count()
    val firstCountMs = ms(t)
    t = System.nanoTime()
    val n2 = df.count()
    val warmCountMs = ms(t)
    require(n1 == nFiles.toLong * rowsPer && n2 == n1,
      s"row count mismatch: $n1 / $n2 vs expected ${nFiles.toLong * rowsPer}")

    println(
      s"""{"files":$nFiles,"rows_per_file":$rowsPer,"partitions":$nParts,""" +
        s""""plan_ms":$planMs,"serial_spill_ms":$serialSpillMs,""" +
        s""""first_count_ms":$firstCountMs,"warm_count_ms":$warmCountMs}""")
    spark.stop()
  }
}
