package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** r17 verdict #5: nobody has shown the stateful-streaming trigger cost
  * curve — RocksDB state-store count (= the stateful operator's pinned
  * partition count) vs per-trigger overhead. This sweeps
  * `graft.stream.stateParts` over the named streaming entries at one
  * core count per invocation and prints one JSON line; run it at 32 AND
  * 8 cores and change session config ONLY if a setting wins at both
  * (it is a measurement tool — the knob's default leaves the bench
  * untouched).
  *
  * Usage: sbt "runMain graft.tools.StreamFloorSweep <cpus> [sfDir]"
  */
object StreamFloorSweep {

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    // the two RocksDB-session pipelines — the only ones the state-shard
    // knob reaches (the rest run windowed/fMGWS aggregations on the
    // shared session whose conf a concurrent drive must not mutate)
    val names = Seq("q20_stream_tws_stats", "q20_stream_tws_bootstrap")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val parts = Seq("32", "8", "4")
    val out = new StringBuilder
    out.append(s"""{"streamfloor":{"cpus":$cpus,"sweep":[""")
    val cells = for (p <- parts; n <- names) yield {
      sys.props("graft.stream.stateParts") = p
      val q = byName(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = try math.min(once(), once()) catch { case _: Throwable => -1.0 }
      println(f"[streamfloor] parts=$p%-3s $n%-24s $best%8.3f s")
      s"""{"q":"$n","stateParts":$p,"sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(best))}}"""
    }
    sys.props.remove("graft.stream.stateParts")
    out.append(cells.mkString(","))
    out.append("]}}")
    println(out.toString)
    spark.stop()
  }
}
