package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [namePrefix]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    // Optional third arg: only run queries whose name starts with the
    // prefix (local iteration); the driver always uses the 2-arg form.
    val prefix = if (args.length == 3) args(2) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // keep saveAsTable output (bucketed-table queries) out of the repo
      // cwd, and per-run so concurrent verifies don't clobber each other
      .config("spark.sql.warehouse.dir",
        RunPaths.scratch("graft_warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Failures are recorded in verify_errors.json as well as stderr: a
    // query that errors at dump time would otherwise simply be ABSENT
    // from the driver's compare (round 5: 36 loader-broken queries were
    // invisible in CORRECTNESS_r05 instead of red). The artifact makes
    // absence distinguishable from never-registered.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-query dump seconds on stderr: the sweep's slow-query radar
        // (this is how the 4-minute cosine-pairs shuffle was caught)
        System.err.println(
          f"[verify] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = JsonText.quote(s)
    val json = SparkEntry.oracleSql.filter(_._1.startsWith(prefix))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // exit 0 even with failures: the driver must still compare the
    // queries that DID dump (a nonzero exit could zero the whole round);
    // the artifact + stderr line carry the failure signal
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED to dump")
    spark.stop()
  }
}
