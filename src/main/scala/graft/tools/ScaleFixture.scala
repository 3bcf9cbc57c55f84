package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Generates a REPLICATED scale fixture from an existing testdata SF dir
  * (r17 verdict #4: the 8-vs-32-core scaling read at sf0.1 is
  * uninformative — every entry is sub-second and overhead-dominated, so
  * ≈1 ratios cannot distinguish "serial at scale" from "tiny input").
  * This is measurement tooling only: nothing on a bench or oracle path
  * reads the generated directory.
  *
  * Replication semantics (x`reps`, default 16 ≈ sf1.6):
  *   - documents: doc_id shifted per replica; every 4th token suffixed
  *     with the replica tag so word 3-gram/8-gram shingle sets DIFFER
  *     across replicas (otherwise every doc becomes a 16-clique of
  *     exact near-dups and the dedup queries degenerate to quadratic
  *     pair blowup instead of scaling linearly); n_chars recomputed.
  *   - lineitem/orders: o_orderkey/l_orderkey shifted consistently so
  *     fact-fact joins match within a replica (16x rows, not 256x
  *     matches); dimension FKs (custkey/partkey/suppkey) unchanged so
  *     dim joins keep matching.
  *   - events: event_id/user_id shifted (sessions stay within replica).
  *   - dimensions (region/nation/customer/supplier/part) + embeddings:
  *     copied as-is (embedding queries are excluded from the scaling
  *     sample — replicated near-identical vectors would make
  *     within-bucket quadratic verifiers pathological, not bigger).
  * Output parquet is written at the session's parallelism so scans have
  * real splits (the single-file sf inputs are exactly what fanOut works
  * around).
  *
  * Usage: sbt "runMain graft.tools.ScaleFixture <srcSf> <outDir> [reps]"
  */
object ScaleFixture {

  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcSf> <outDir> [reps]")
    val src = args(0)
    val out = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(16)
    val spark: SparkSession = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame = graft.Tables.load(spark, src, name)
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalefixture] wrote $name")
    }
    def replicated(name: String)(shift: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = load(name)
      (0 until reps).map(i => shift(base, i)).reduce(_.unionByName(_))
        .repartition(spark.sparkContext.defaultParallelism)
    }

    write(replicated("documents") { (d, i) =>
      val perturbed =
        if (i == 0) d.select(col("doc_id"), col("text"), col("lang"), col("source"))
        else d.select(
          (col("doc_id") + lit(i * Off)).as("doc_id"),
          array_join(
            transform(split(col("text"), " "),
              (w, ix) => when(ix % 4 === 3, concat(w, lit(s"_r$i"))).otherwise(w)),
            " ").as("text"),
          col("lang"), col("source"))
      perturbed.withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    write(replicated("lineitem") { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * Off))
    }, "lineitem")

    write(replicated("orders") { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * Off))
    }, "orders")

    write(replicated("events") { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * Off))
        .withColumn("user_id", col("user_id") + lit(i * Off))
    }, "events")

    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
      .foreach(n => write(load(n), n))

    println(s"[scalefixture] done: $out (x$reps)")
    spark.stop()
  }
}
