package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.SummaryRewriteRule

/** Routing-overhead rehearsal for the multi-cube MV catalog (VERDICT
  * r11 #4): the q83/q85 router had only ever faced 2-3 cubes per fact;
  * a real warehouse maintains DOZENS. This registers up to `maxCubes`
  * REAL cubes (distinct dim subsets of the lineitem table, each built
  * and measured) and times PLANNING — `queryExecution.optimizedPlan`, no
  * execution — at increasing catalog sizes, for the two routing shapes:
  *   - a global aggregate every cube can answer (the router must scan
  *     the whole candidate list and pick the measured-smallest);
  *   - a grouped query only ONE cube can answer (worst-case scan: the
  *     eligible cube is deliberately registered LAST in routing order).
  * Steady-state per-plan cost is what a dashboard server pays per
  * query; the first plan additionally pays one summary re-analysis per
  * attempted candidate (amortized by the rule's bounded plan cache).
  *
  * Prints one JSON line:
  * {"metric":"routing_rehearsal","catalog":[{"n":…,"first_ms":…,
  *   "global_ms":…,"grouped_ms":…,"routed_ok":true},…]}
  *
  * Usage: runMain graft.tools.RoutingRehearsal <sfDir> [maxCubes]
  */
object RoutingRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxCubes = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val factPath = s"$sfDir/lineitem.parquet"
    val fact = spark.read.parquet(factPath)
    // distinct dim subsets over columns of very different cardinality —
    // the incomparable-dim-set shape where routing order matters
    val pool = Seq("l_returnflag", "l_linestatus", "l_shipdate",
      "l_discount", "l_tax", "l_linenumber", "l_suppkey", "l_partkey",
      "l_orderkey")
    val dimSets: Seq[Seq[String]] =
      (pool.map(Seq(_)) ++
        pool.combinations(2).toSeq ++
        pool.combinations(3).toSeq).take(maxCubes)
    System.err.println(s"[routing] building ${dimSets.length} cubes over lineitem")
    val cubes = dimSets.zipWithIndex.map { case (dims, i) =>
      val path = graft.RunPaths.scratch(f"graft_routing_cube_$i%02d")
      fact.groupBy(dims.map(col): _*)
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_l_quantity"))
        .write.mode("overwrite").parquet(path)
      val rows = spark.read.parquet(path).count()
      SummaryRewriteRule.SummaryDef(path, dims.toSet,
        measures = Set("l_quantity"), rows = Some(rows))
    }
    // a 3-dim set ONLY one cube has: its grouped query is the
    // worst-case routing scan (every cheaper candidate is ineligible)
    val grouped3 = cubes.filter(_.dims.size == 3).lastOption.getOrElse(cubes.last)

    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
      }.flatten

    def timePlans(df: => org.apache.spark.sql.DataFrame, n: Int): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => df.queryExecution.optimizedPlan)
      (System.nanoTime() - t0) / 1e6 / n
    }

    val results = Seq(1, 10, maxCubes).distinct.filter(_ <= cubes.length).map { n =>
      SummaryRewriteRule.registerFresh(factPath, cubes.take(n))
      val child = spark.newSession()
      child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
      def global = child.read.parquet(factPath)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      def grouped = child.read.parquet(factPath)
        .groupBy(grouped3.dims.toSeq.sorted.map(col): _*)
        .agg(count(lit(1)).as("n"))
      // first plan: pays candidate analysis (file listing + schema) up
      // to the first cube that rewrites
      val firstMs = timePlans(global, 1)
      // steady state: plan cache warm, per-plan cost = routing scan +
      // rewrite attempt
      val globalMs = timePlans(global, 20)
      val groupedMs = timePlans(grouped, 20)
      // routing correctness re-checked at every catalog size: the
      // global aggregate must read the measured-smallest cube OF THE
      // REGISTERED subset, the grouped query its one eligible cube
      val smallestOfN = cubes.take(n).minBy(_.rows.get)
      val routedOk =
        scansOf(global).exists(_.contains(smallestOfN.summaryPath
          .split('/').last)) &&
        (!cubes.take(n).contains(grouped3) ||
          scansOf(grouped).exists(_.contains(grouped3.summaryPath
            .split('/').last)))
      System.err.println(
        f"[routing] catalog=$n%3d first=${firstMs}%8.1f ms " +
          f"global=${globalMs}%6.1f ms grouped=${groupedMs}%6.1f ms ok=$routedOk")
      (n, firstMs, globalMs, groupedMs, routedOk)
    }
    SummaryRewriteRule.unregister(factPath)
    val json = results.map { case (n, f, g, gr, ok) =>
      s"""{"n":$n,"first_ms":$f,"global_ms":$g,"grouped_ms":$gr,"routed_ok":$ok}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"routing_rehearsal","catalog":$json,"sf":${graft.JsonText.quote(sfDir)}}""")
    spark.stop()
  }
}
