package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scale rehearsal (VERDICT r7 #8): measure how the headline
  * iterative operators actually scale when the corpus grows 10×, rather
  * than arguing survival from plan shape alone.
  *
  * Builds a `factor`× blowup of documents + embeddings from a source sf
  * dir (other tables symlinked), then times the named queries on BOTH
  * dirs with Bench's min-of-3 discipline and prints one JSON line with
  * per-query seconds and the measured scaling factor.
  *
  * Blowup semantics preserve per-query workload STRUCTURE rather than
  * degenerate it: replica k > 0 suffixes every token with `_rk`, so
  * shingle/gram/near-dup relations hold within a replica exactly as in
  * the original corpus but never across replicas — a pure-duplication
  * blowup would instead make every 8-gram a 10× duplicate and turn
  * self-excision into "excise everything". Embeddings jitter each
  * replica by a small per-replica constant for the same reason; the
  * query vector (vec_id 0) stays unique.
  *
  * Usage: runMain graft.tools.ScaleRehearsal <srcSfDir> <factor> <outDir> [q1,q2,...]
  */
object ScaleRehearsal {

  private val DefaultQueries = Seq(
    "q23_minhash_lsh", "q23_dedup_clusters", "q47_self_excise",
    "q61_quality_perceptron", "q24_ann_lsh", "q71_image_neardup",
    "q73_audio_neardup")

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.tools.ScaleRehearsal <srcSfDir> <factor> <outDir> [q1,q2,...]")
      sys.exit(2)
    }
    val Array(src, factorS, out) = args.take(3)
    val factor = factorS.toInt
    val queries =
      if (args.length > 3) args(3).split(",").toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    buildBlowup(spark, src, factor, out)

    def measure(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      Seq(once(), once(), once()).min
    }
    val rows = queries.map { q =>
      val base = measure(q, src)
      val blown = measure(q, out)
      System.err.println(f"[rehearsal] $q%-24s ${base}%7.2f s -> ${blown}%7.2f s  x${blown / base}%.2f")
      (q, base, blown)
    }
    val json = rows.map { case (q, b, s) =>
      val k = graft.JsonText.quote(q)
      s"""$k:{"base_sec":$b,"scaled_sec":$s,"factor":${s / b}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_rehearsal","data_factor":$factor,"queries":$json,"src":${graft.JsonText.quote(src)}}""")
    spark.stop()
  }

  /** Write the blown-up documents/embeddings to `out` (idempotent: skips
    * when the output already exists with the expected row count) and
    * symlink every other table from `src`.
    */
  def buildBlowup(spark: SparkSession, src: String, factor: Int, out: String): Unit = {
    Files.createDirectories(Paths.get(out))
    val docsOut = s"$out/documents.parquet"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val wantDocs = docs.count() * factor
    val haveDocs =
      if (!Files.exists(Paths.get(docsOut))) -1L
      else try spark.read.parquet(docsOut).count()
      catch { case _: Throwable => -1L }
    if (haveDocs != wantDocs) {
      val reps = spark.range(factor).toDF("rep")
      docs.crossJoin(reps)
        .select(
          (col("doc_id") + col("rep") * 100000000L).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "),
                t => concat(t, lit("_r"), col("rep"))), " ")).as("text"),
          col("lang"), col("source"),
          length(when(col("rep") === 0, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "),
                t => concat(t, lit("_r"), col("rep"))), " "))).cast("long")
            .as("n_chars"))
        .write.mode("overwrite").parquet(docsOut)
    }
    val embOut = s"$out/embeddings.parquet"
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val wantEmb = (emb.count() - 1) * factor + 1
    val haveEmb =
      if (!Files.exists(Paths.get(embOut))) -1L
      else try spark.read.parquet(embOut).count()
      catch { case _: Throwable => -1L }
    if (haveEmb != wantEmb) {
      val reps = spark.range(factor).toDF("rep")
      emb.filter(col("vec_id") =!= 0).crossJoin(reps)
        .select(
          (col("vec_id") + col("rep") * 100000000L).as("vec_id"),
          transform(col("embedding"),
            x => (x + col("rep").cast("float") * lit(0.001f)).cast("float"))
            .as("embedding"),
          col("label"))
        .union(emb.filter(col("vec_id") === 0))
        .write.mode("overwrite").parquet(embOut)
    }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      val link = Paths.get(out, s"$t.parquet")
      // NOFOLLOW: a dangling link (what a relative srcSfDir used to
      // create) must be detected and replaced, not reported absent by
      // the follow-the-target default and then collided with
      if (Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
          !Files.exists(link))
        Files.delete(link) // dangling: self-repair
      // absolute target: a relative srcSfDir would otherwise produce a
      // symlink resolved against the OUTPUT dir — i.e. dangling
      if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        Files.createSymbolicLink(link,
          Paths.get(src, s"$t.parquet").toAbsolutePath)
    }
  }
}
