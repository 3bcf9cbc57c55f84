package graft.tools

import java.nio.file.Paths

/** Scratch profiler for the conversion hot path: times scan, write, and
  * read-back separately on the 200k bench fixture. Not part of the
  * declared surface; run with `sbt "runMain graft.tools.TimeConvert"`.
  */
object TimeConvert {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val src = graft.queries.Conversion.ensureBenchFixture()
    val out = Paths.get(System.getProperty("java.io.tmpdir"), "graft_time_convert.parquet").toString
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.range(100).count() // warmup
    for (_ <- 1 to 2) {
      val df = spark.read.format("excel").load(src)
      time("scan+count")(df.count())
      time("scan+write")(df.write.mode("overwrite")
        .option("compression", "zstd").parquet(out))
      time("readback count")(spark.read.parquet(out).count())
    }
    spark.stop()
  }
}
