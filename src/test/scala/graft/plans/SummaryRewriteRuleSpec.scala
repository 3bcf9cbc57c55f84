package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans.SummaryRewriteRule: eligible aggregates over a registered fact
  * table must read the summary (including subset-dim rollups), every
  * ineligible shape must be left untouched, and the rewritten result
  * must equal the fact-side answer exactly.
  */
class SummaryRewriteRuleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val factPath = s"$sf/lineitem.parquet"

  private lazy val summaryReady: String = {
    val sumPath = graft.RunPaths.scratch("graft_mvspec_summary")
    spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_partkey")).as("sum_l_partkey"),
        min(col("l_quantity")).as("min_l_quantity"),
        max(col("l_quantity")).as("max_l_quantity"))
      .write.mode("overwrite").parquet(sumPath)
    SummaryRewriteRule.register(factPath,
      SummaryRewriteRule.SummaryDef(sumPath,
        dims = Set("l_returnflag", "l_linestatus", "l_linenumber"),
        measures = Set("l_partkey", "l_quantity")))
    sumPath
  }

  private def childWithRule(): SparkSession = {
    summaryReady
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    child
  }

  private def scansOf(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  test("subset-dim rollup reads the summary and equals the fact answer") {
    val child = childWithRule()
    def q(s: SparkSession) = s.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
      .orderBy("l_returnflag")
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"rewrite did not fire: ${scansOf(rewritten)}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq,
      "rewritten answer diverged from the fact-side answer")
  }

  test("ineligible shapes are left untouched (exactness guard)") {
    val child = childWithRule()
    def scansFact(df: DataFrame): Unit = {
      assert(scansOf(df).exists(_.contains("lineitem")),
        s"ineligible aggregate was rewritten: ${df.queryExecution.optimizedPlan}")
      assert(!scansOf(df).exists(_.contains("graft_mvspec_summary")))
    }
    val fact = child.read.parquet(factPath)
    // unsupported aggregate (avg is not re-aggregable from these columns)
    scansFact(fact.groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("a")))
    // grouping by a column outside the summary dims
    scansFact(fact.groupBy(col("l_shipdate"))
      .agg(count(lit(1)).as("n")))
    // distinct aggregates are not derivable from the summary
    scansFact(fact.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")))
    // measure not covered by the summary
    scansFact(fact.groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("s")))
    // non-trivial grouping expression
    scansFact(fact.groupBy(upper(col("l_returnflag")).as("u"))
      .agg(count(lit(1)).as("n")))
  }

  test("a measure filter below the aggregate blocks the rewrite") {
    // a WHERE on a NON-dim column slices within summary groups and
    // cannot be answered from the cube — must be left untouched
    val child = childWithRule()
    val df = child.read.parquet(factPath)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    assert(scansOf(df).exists(_.contains("lineitem")))
    assert(!scansOf(df).exists(_.contains("graft_mvspec_summary")))
  }

  test("a non-deterministic filter blocks the rewrite") {
    // NB: a PROVABLY-true rand predicate (rand() < 2.0) is removed by
    // the main optimizer before extra rules run — that shape rewrites,
    // correctly. This one survives optimization and must block.
    val child = childWithRule()
    val df = child.read.parquet(factPath)
      .filter(rand() < 0.9999)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    assert(scansOf(df).exists(_.contains("lineitem")))
    assert(!scansOf(df).exists(_.contains("graft_mvspec_summary")))
  }

  test("a dims-only filter is pushed onto the summary and stays exact") {
    val child = childWithRule()
    def q(s: SparkSession) = s.read.parquet(factPath)
      .filter(col("l_returnflag") === "A" && col("l_linenumber") <= 3)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
      .orderBy("l_linestatus")
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"dims-filtered rewrite did not fire: ${scansOf(rewritten)}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq,
      "dims-filtered rewritten answer diverged from the fact-side answer")
  }

  test("two eligible aggregates in one query get DISTINCT relation instances") {
    // substituting the cached plan verbatim would plant identical
    // exprIds on both branches of the union — a plan-invariant
    // violation after analysis-time DeduplicateRelations has run
    val child = childWithRule()
    val fact = child.read.parquet(factPath)
    val a = fact.groupBy(col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("n"))
    val b = fact.groupBy(col("l_linestatus").as("k"))
      .agg(count(lit(1)).as("n"))
    val u = a.unionByName(b)
    val rels = u.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr
    }
    assert(rels.size == 2, s"expected two summary scans: ${u.queryExecution.optimizedPlan}")
    val ids = rels.map(_.output.map(_.exprId).toSet)
    assert(ids(0).intersect(ids(1)).isEmpty,
      "both branches carry the same attribute ids — cached relation substituted verbatim")
    // and the result is still exact
    def plain(s: SparkSession) = {
      val f = s.read.parquet(factPath)
      f.groupBy(col("l_returnflag").as("k")).agg(count(lit(1)).as("n"))
        .unionByName(
          f.groupBy(col("l_linestatus").as("k")).agg(count(lit(1)).as("n")))
    }
    assert(u.orderBy("k", "n").collect().map(_.toSeq).toSeq ==
      plain(spark).orderBy("k", "n").collect().map(_.toSeq).toSeq)
  }

  test("HAVING on a group column still routes to the summary") {
    // dashboards emit HAVING on dims; Catalyst pushes a group-column
    // predicate below the aggregate, where factOf collects it — the
    // rewrite must survive the round trip and stay exact
    val child = childWithRule()
    def q(s: SparkSession) = {
      s.read.parquet(factPath).createOrReplaceTempView("f_having")
      s.sql("""SELECT l_linestatus, count(*) AS n, sum(l_partkey) AS s
              |FROM f_having
              |GROUP BY l_linestatus
              |HAVING l_linestatus <> 'Z'
              |ORDER BY l_linestatus""".stripMargin)
    }
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"dims-HAVING rewrite did not fire: ${scansOf(rewritten)}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
  }

  test("HAVING on a measure aggregate stays above the rewritten " +
      "aggregate and stays exact") {
    // the negative control for HAVING: a predicate over the AGGREGATED
    // measure cannot be collected as a summary filter (it references
    // post-aggregation values); it must remain a Filter above the
    // rewritten aggregate, never be re-anchored into the summary scan
    val child = childWithRule()
    def q(s: SparkSession) = s.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"))
      .filter(col("s") > 100)
      .orderBy("l_returnflag")
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"measure-HAVING blocked the aggregate rewrite: ${scansOf(rewritten)}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
  }

  test("Project-over-Filter-over-Project chains between aggregate and " +
      "fact still rewrite") {
    val child = childWithRule()
    def q(s: SparkSession) = s.read.parquet(factPath)
      .select("l_returnflag", "l_linestatus", "l_partkey")
      .filter(col("l_returnflag") === "A")
      .select("l_linestatus", "l_partkey")
      .groupBy(col("l_linestatus"))
      .agg(sum(col("l_partkey")).as("s"))
      .orderBy("l_linestatus")
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"project/filter/project rewrite did not fire: ${scansOf(rewritten)}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
  }

  test("newSession-per-query servers cannot grow the plan cache without " +
      "bound") {
    // each cached plan strongly pins its session (HadoopFsRelation →
    // session), so an unbounded cache would leak one session + file
    // listing per newSession — the exact q74 serving pattern; the LRU
    // cap turns that into a bounded steady-state
    val child0 = childWithRule()
    for (_ <- 1 to 80) {
      val s = child0.newSession()
      s.experimental.extraOptimizations = Seq(SummaryRewriteRule)
      val df = s.read.parquet(factPath)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(scansOf(df).exists(_.contains("graft_mvspec_summary")))
    }
    assert(SummaryRewriteRule.cachedPlanCount <= 64,
      s"plan cache grew past its cap: ${SummaryRewriteRule.cachedPlanCount}")
  }

  test("aggregate over a star join routes the FACT side to the summary") {
    // Aggregate(Join(fact, dim)) with the join key a summary dim:
    // group rows are key-homogeneous, so the join drops/replicates them
    // exactly as it would fact rows — rewrite joins summary ⋈ dim
    val child = childWithRule()
    def q(s: SparkSession) = {
      import s.implicits._
      val dim = Seq((1, "first"), (2, "second"), (3, "third"))
        .toDF("ln", "line_name")
      s.read.parquet(factPath)
        .join(dim, col("l_linenumber") === col("ln"))
        .groupBy(col("line_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"),
          min(col("l_quantity")).as("mn"))
        .orderBy("line_name")
    }
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"star-join rewrite did not fire: ${rewritten.queryExecution.optimizedPlan}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq,
      "star-join rewritten answer diverged from the fact-side answer")
  }

  test("a dim table that carries its OWN registered cube does not " +
      "shadow the fact's rewrite") {
    // the q80-in-one-JVM regression shape: nation (a DIM of the star
    // query) is itself a registered fact elsewhere in the process.
    // locateCandidates must try EVERY registered side — committing to
    // the first registered relation found and declining when its cubes
    // don't fit would lose the fact rewrite whenever a dim happens to
    // be registered too (a normal multi-cube warehouse state).
    val child = childWithRule()
    val dimPath = graft.RunPaths.scratch("graft_mvspec_dimcube_dim")
    val dimCube = graft.RunPaths.scratch("graft_mvspec_dimcube_cube")
    import spark.implicits._
    Seq((1, "first", 7L), (2, "second", 7L), (3, "third", 8L))
      .toDF("ln", "line_name", "region").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).groupBy(col("region"))
      .agg(count(lit(1)).as("cnt"), sum(col("ln")).as("sum_ln"))
      .write.mode("overwrite").parquet(dimCube)
    SummaryRewriteRule.register(dimPath,
      SummaryRewriteRule.SummaryDef(dimCube,
        dims = Set("region"), measures = Set("ln")))
    def q(s: SparkSession) = s.read.parquet(factPath)
      .join(s.read.parquet(dimPath), col("l_linenumber") === col("ln"))
      .groupBy(col("line_name"))
      .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"))
      .orderBy("line_name")
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"fact rewrite lost to the registered dim: " +
        s"${rewritten.queryExecution.optimizedPlan}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    // the dim side stays a live scan of the dim table itself
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_dimcube_dim")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
    SummaryRewriteRule.unregister(dimPath)
  }

  test("two-dimension star/snowflake chain routes the fact to the summary") {
    // fact ⋈ d1 ⋈ d2 where d2 links to d1 (snowflake): the d2 conjunct
    // references no fact column and must pass through untouched; only
    // the fact-holding join's key re-anchors onto the summary
    val child = childWithRule()
    def q(s: SparkSession) = {
      import s.implicits._
      val d1 = Seq((1, 10), (2, 20), (3, 30)).toDF("ln", "grp_key")
      val d2 = Seq((10, "low"), (20, "mid"), (30, "high"))
        .toDF("gk", "grp_name")
      s.read.parquet(factPath)
        .join(d1, col("l_linenumber") === col("ln"))
        .join(d2, col("grp_key") === col("gk"))
        .groupBy(col("grp_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"),
          max(col("l_quantity")).as("mx"))
        .orderBy("grp_name")
    }
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"chain rewrite did not fire: ${rewritten.queryExecution.optimizedPlan}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq,
      "chain rewritten answer diverged from the fact-side answer")
  }

  test("a WHERE on the dim table pushes into the dim side and the " +
      "join still rewrites") {
    // the q80 dashboard filter shape: Catalyst pushes a dim-column
    // predicate below the join into the dim side, so the rewrite sees
    // an untouched (pre-filtered) dim subtree and must still fire
    val child = childWithRule()
    def q(s: SparkSession) = {
      import s.implicits._
      val dim = Seq((1, "first"), (2, "second"), (3, "third"))
        .toDF("ln", "line_name")
      s.read.parquet(factPath)
        .join(dim, col("l_linenumber") === col("ln"))
        .filter(col("line_name") =!= "second")
        .groupBy(col("line_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_partkey")).as("s"))
        .orderBy("line_name")
    }
    val rewritten = q(child)
    assert(scansOf(rewritten).exists(_.contains("graft_mvspec_summary")),
      s"dim-filtered join rewrite did not fire: ${rewritten.queryExecution.optimizedPlan}")
    assert(!scansOf(rewritten).exists(_.contains("lineitem")))
    assert(rewritten.collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
  }

  test("star-join rewrite declines every inexact shape") {
    val child = childWithRule()
    import child.implicits._
    def scansFact(df: DataFrame): Unit = {
      assert(scansOf(df).exists(_.contains("lineitem")),
        s"inexact join shape was rewritten: ${df.queryExecution.optimizedPlan}")
      assert(!scansOf(df).exists(_.contains("graft_mvspec_summary")))
    }
    val fact = child.read.parquet(factPath)
    val dim = Seq((1, "first", 10L), (2, "second", 20L))
      .toDF("ln", "line_name", "weight")
    // aggregate over a DIM column: fact-row multiplicity weights each
    // dim value — not derivable from the summary
    scansFact(fact.join(dim, col("l_linenumber") === col("ln"))
      .groupBy(col("line_name")).agg(sum(col("weight")).as("w")))
    // join on a fact MEASURE (not a summary dim): groups are not
    // key-homogeneous, the join slices within them
    scansFact(fact.join(dim, col("l_partkey") === col("ln"))
      .groupBy(col("line_name")).agg(count(lit(1)).as("n")))
    // outer join fabricates null-extended rows at row granularity
    scansFact(fact.join(dim, col("l_linenumber") === col("ln"), "left")
      .groupBy(col("line_name")).agg(count(lit(1)).as("n")))
    // non-equi conjunct referencing the fact side
    scansFact(fact.join(dim,
        col("l_linenumber") === col("ln") && col("l_partkey") > col("weight"))
      .groupBy(col("line_name")).agg(count(lit(1)).as("n")))
  }

  test("re-register after a summary rebuild serves the NEW files") {
    // v1 summary is built from HALF the fact (deliberately wrong), the
    // rebuild from the full fact; without register-time cache
    // invalidation the second query would serve the stale v1 listing
    // (failed reads at best, silently stale aggregates if files linger)
    val ordersPath = s"$sf/orders.parquet"
    val sumPath = graft.RunPaths.scratch("graft_mvspec_rebuild_summary")
    def build(df: DataFrame): Unit = df
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_custkey")).as("sum_o_custkey"))
      .write.mode("overwrite").parquet(sumPath)
    def reg(): Unit = SummaryRewriteRule.register(ordersPath,
      SummaryRewriteRule.SummaryDef(sumPath,
        dims = Set("o_orderstatus", "o_orderpriority"),
        measures = Set("o_custkey")))
    val orders = spark.read.parquet(ordersPath)
    build(orders.filter(col("o_orderkey") % 2 === 0))
    reg()
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    def q() = child.read.parquet(ordersPath)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
    assert(scansOf(q()).exists(_.contains("graft_mvspec_rebuild_summary")))
    val v1 = q().collect().map(_.toSeq).toSeq
    // rebuild at the SAME path (overwrite → new part files) + re-register
    build(orders)
    reg()
    val v2 = q().collect().map(_.toSeq).toSeq
    val truth = orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).orderBy("o_orderstatus")
      .collect().map(_.toSeq).toSeq
    assert(v1 != v2, "rebuild was invisible — stale plan served")
    assert(v2 == truth, "post-rebuild answer must come from the new files")
  }

  test("two registered cubes: each query routes to the SMALLEST " +
      "eligible one") {
    val customerPath = s"$sf/customer.parquet"
    val customer = spark.read.parquet(customerPath)
    val coarsePath = graft.RunPaths.scratch("graft_mvspec_coarse_cube")
    val finePath = graft.RunPaths.scratch("graft_mvspec_fine_cube")
    customer.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(col("c_custkey")).as("sum_c_custkey"))
      .write.mode("overwrite").parquet(coarsePath)
    customer.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("c_custkey")).as("sum_c_custkey"))
      .write.mode("overwrite").parquet(finePath)
    // coarse registered FIRST: if routing were recency-first rather
    // than fewest-dims-first, the coarse query below would wrongly
    // land on the finer cube
    SummaryRewriteRule.register(customerPath,
      SummaryRewriteRule.SummaryDef(coarsePath,
        dims = Set("c_mktsegment"), measures = Set("c_custkey")))
    SummaryRewriteRule.register(customerPath,
      SummaryRewriteRule.SummaryDef(finePath,
        dims = Set("c_mktsegment", "c_nationkey"),
        measures = Set("c_custkey")))
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    val coarseQ = child.read.parquet(customerPath)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("s"))
      .orderBy("c_mktsegment")
    val fineQ = child.read.parquet(customerPath)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("s"))
      .orderBy("c_mktsegment", "c_nationkey")
    assert(scansOf(coarseQ).exists(_.contains("graft_mvspec_coarse_cube")),
      "coarse query must read the coarse (smallest eligible) cube")
    assert(!scansOf(coarseQ).exists(_.contains("graft_mvspec_fine_cube")))
    assert(scansOf(fineQ).exists(_.contains("graft_mvspec_fine_cube")),
      "finer query must fall through the coarse cube to the finer one")
    assert(!scansOf(fineQ).exists(_.contains("customer.parquet")),
      "finer query must still not scan the fact")
    // and both answers stay exact
    val truthC = spark.read.parquet(customerPath).groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("s"))
      .orderBy("c_mktsegment").collect().map(_.toSeq).toSeq
    assert(coarseQ.collect().map(_.toSeq).toSeq == truthC)
    val truthF = spark.read.parquet(customerPath)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("s"))
      .orderBy("c_mktsegment", "c_nationkey").collect().map(_.toSeq).toSeq
    assert(fineQ.collect().map(_.toSeq).toSeq == truthF)
  }

  test("a same-shape cube rebuilt under a NEW path supersedes the old " +
      "one — the stale build stops routing") {
    // the immutable-output rebuild pattern: each build writes a fresh
    // directory. The old cube is eligible for exactly the queries the
    // new one answers, so leaving it registered would keep serving the
    // stale build (silently wrong once the fact data moved on)
    val nationPath = s"$sf/nation.parquet"
    val nation = spark.read.parquet(nationPath)
    val v1Path = graft.RunPaths.scratch("graft_mvspec_newpath_v1")
    val v2Path = graft.RunPaths.scratch("graft_mvspec_newpath_v2")
    def build(df: DataFrame, path: String): Unit = df
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_nationkey")).as("sum_n_nationkey"))
      .write.mode("overwrite").parquet(path)
    def reg(path: String): Unit = SummaryRewriteRule.register(nationPath,
      SummaryRewriteRule.SummaryDef(path,
        dims = Set("n_regionkey"), measures = Set("n_nationkey")))
    // v1 deliberately built from a slice — stale the moment v2 exists
    build(nation.filter(col("n_nationkey") < 10), v1Path)
    reg(v1Path)
    build(nation, v2Path)
    reg(v2Path)
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    val q = child.read.parquet(nationPath)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      .orderBy("n_regionkey")
    assert(scansOf(q).exists(_.contains("graft_mvspec_newpath_v2")),
      "the rebuilt cube must serve")
    assert(!scansOf(q).exists(_.contains("graft_mvspec_newpath_v1")),
      "the superseded same-shape cube must no longer be routable")
    val truth = nation.groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      .orderBy("n_regionkey").collect().map(_.toSeq).toSeq
    assert(q.collect().map(_.toSeq).toSeq == truth)
    // registerFresh swaps a fact's WHOLE cube set atomically — the
    // post-data-refresh handshake for cubes of DIFFERENT shapes
    SummaryRewriteRule.registerFresh(nationPath, Seq(
      SummaryRewriteRule.SummaryDef(v2Path,
        dims = Set("n_regionkey"), measures = Set("n_nationkey"))))
    assert(scansOf(child.read.parquet(nationPath)
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n")))
      .exists(_.contains("graft_mvspec_newpath_v2")))
  }

  test("row-count routing: a GLOBAL aggregate reads the measured-" +
      "smallest cube, not the fewest-dims one") {
    // incomparable dim sets are where the width proxy mispicks: a
    // 1-dim cube over a high-cardinality column dwarfs a 2-dim cube
    // over two tiny columns, and a global aggregate is answerable
    // from both. With measured rows on every cube, routing must read
    // the small one.
    val ordersPath = s"$sf/orders.parquet"
    // own the fact's catalog state: an earlier test's leftover orders
    // cube would add a routable candidate this test does not control
    SummaryRewriteRule.unregister(ordersPath)
    val orders = spark.read.parquet(ordersPath)
    val widePath = graft.RunPaths.scratch("graft_mvspec_cost_wide")
    val tinyPath = graft.RunPaths.scratch("graft_mvspec_cost_tiny")
    orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("sum_o_orderkey"))
      .write.mode("overwrite").parquet(widePath)
    orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("sum_o_orderkey"))
      .write.mode("overwrite").parquet(tinyPath)
    val nWide = spark.read.parquet(widePath).count()
    val nTiny = spark.read.parquet(tinyPath).count()
    assert(nWide > nTiny, s"fixture must be a real mispick: $nWide vs $nTiny")
    SummaryRewriteRule.register(ordersPath,
      SummaryRewriteRule.SummaryDef(widePath,
        dims = Set("o_custkey"), measures = Set("o_orderkey"),
        rows = Some(nWide)))
    SummaryRewriteRule.register(ordersPath,
      SummaryRewriteRule.SummaryDef(tinyPath,
        dims = Set("o_orderstatus", "o_orderpriority"),
        measures = Set("o_orderkey"), rows = Some(nTiny)))
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    def q(s: SparkSession) = s.read.parquet(ordersPath)
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
    assert(scansOf(q(child)).exists(_.contains("graft_mvspec_cost_tiny")),
      s"global aggregate must read the measured-smallest cube: " +
        s"${scansOf(q(child))}")
    assert(q(child).collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
    // a grouped query only the WIDE cube can answer still routes there
    def qc(s: SparkSession) = s.read.parquet(ordersPath)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
    assert(scansOf(qc(child)).exists(_.contains("graft_mvspec_cost_wide")))
    assert(qc(child).collect().map(_.toSeq).toSeq ==
      qc(spark).collect().map(_.toSeq).toSeq)
    SummaryRewriteRule.unregister(ordersPath)
  }

  test("mixed catalog: one UNMEASURED cube does not degrade routing " +
      "to the width proxy — measured cubes still sort first") {
    // the all-or-nothing regression shape: a legacy registration
    // without `rows` used to drop the WHOLE fact back to fewest-dims,
    // where the 1-dim high-cardinality cube beats the measured 2-dim
    // tiny one — exactly the mispick measured routing exists to
    // prevent. Missing rows must mean "assume huge", not "forget the
    // other cubes' measurements".
    val ordersPath = s"$sf/orders.parquet"
    SummaryRewriteRule.unregister(ordersPath)
    val orders = spark.read.parquet(ordersPath)
    val widePath = graft.RunPaths.scratch("graft_mvspec_mixed_wide")
    val tinyPath = graft.RunPaths.scratch("graft_mvspec_mixed_tiny")
    orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("sum_o_orderkey"))
      .write.mode("overwrite").parquet(widePath)
    orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("sum_o_orderkey"))
      .write.mode("overwrite").parquet(tinyPath)
    val nTiny = spark.read.parquet(tinyPath).count()
    assert(spark.read.parquet(widePath).count() > nTiny)
    // the big 1-dim cube registers WITHOUT a measurement; the tiny
    // 2-dim cube carries one
    SummaryRewriteRule.register(ordersPath,
      SummaryRewriteRule.SummaryDef(widePath,
        dims = Set("o_custkey"), measures = Set("o_orderkey")))
    SummaryRewriteRule.register(ordersPath,
      SummaryRewriteRule.SummaryDef(tinyPath,
        dims = Set("o_orderstatus", "o_orderpriority"),
        measures = Set("o_orderkey"), rows = Some(nTiny)))
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    def q(s: SparkSession) = s.read.parquet(ordersPath)
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
    assert(scansOf(q(child)).exists(_.contains("graft_mvspec_mixed_tiny")),
      s"one unmeasured cube must not drop the fact to the width " +
        s"proxy: ${scansOf(q(child))}")
    assert(q(child).collect().map(_.toSeq).toSeq ==
      q(spark).collect().map(_.toSeq).toSeq)
    // a grouped query only the unmeasured wide cube can answer still
    // routes there (unmeasured means later in the order, not dropped)
    def qc(s: SparkSession) = s.read.parquet(ordersPath)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
    assert(scansOf(qc(child)).exists(_.contains("graft_mvspec_mixed_wide")))
    assert(qc(child).collect().map(_.toSeq).toSeq ==
      qc(spark).collect().map(_.toSeq).toSeq)
    SummaryRewriteRule.unregister(ordersPath)
  }

  test("registerFresh routes by measured rows and breaks equal-cost " +
      "ties by recency (last of the swapped set wins)") {
    val ordersPath = s"$sf/orders.parquet"
    SummaryRewriteRule.unregister(ordersPath)
    val orders = spark.read.parquet(ordersPath)
    def build(path: String, dims: Seq[String]): Long = {
      orders.groupBy(dims.map(col): _*)
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_orderkey")).as("sum_o_orderkey"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path).count()
    }
    val widePath = graft.RunPaths.scratch("graft_mvspec_fresh_wide")
    val tinyPath = graft.RunPaths.scratch("graft_mvspec_fresh_tiny")
    val nWide = build(widePath, Seq("o_custkey"))
    val nTiny = build(tinyPath, Seq("o_orderstatus", "o_orderpriority"))
    assert(nWide > nTiny)
    // rows ordering must engage through the ATOMIC swap path too, not
    // only one-by-one register — wide listed FIRST to prove order of
    // the seq is not what routes
    SummaryRewriteRule.registerFresh(ordersPath, Seq(
      SummaryRewriteRule.SummaryDef(widePath,
        dims = Set("o_custkey"), measures = Set("o_orderkey"),
        rows = Some(nWide)),
      SummaryRewriteRule.SummaryDef(tinyPath,
        dims = Set("o_orderstatus", "o_orderpriority"),
        measures = Set("o_orderkey"), rows = Some(nTiny))))
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    def g(s: SparkSession) = s.read.parquet(ordersPath)
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
    assert(scansOf(g(child)).exists(_.contains("graft_mvspec_fresh_tiny")),
      s"registerFresh must route the global aggregate to the " +
        s"measured-smallest cube: ${scansOf(g(child))}")
    // equal-cost tie (identical dims/measures/rows under two paths):
    // register-one-by-one semantics make the LAST of the swapped set
    // the most recent registration — it must win the tie
    val v1 = graft.RunPaths.scratch("graft_mvspec_fresh_v1")
    val v2 = graft.RunPaths.scratch("graft_mvspec_fresh_v2")
    val n1 = build(v1, Seq("o_orderstatus"))
    val n2 = build(v2, Seq("o_orderstatus"))
    assert(n1 == n2)
    def sd(p: String) = SummaryRewriteRule.SummaryDef(p,
      dims = Set("o_orderstatus"), measures = Set("o_orderkey"),
      rows = Some(n1))
    SummaryRewriteRule.registerFresh(ordersPath, Seq(sd(v1), sd(v2)))
    assert(scansOf(g(child)).exists(_.contains("graft_mvspec_fresh_v2")),
      s"equal-cost tie must prefer the most recent registration " +
        s"(v2, last of the set): ${scansOf(g(child))}")
    SummaryRewriteRule.unregister(ordersPath)
  }

  test("equal-width cubes: routing prefers the most recent " +
      "registration (freshness tie-break)") {
    val partPath = s"$sf/part.parquet"
    val part = spark.read.parquet(partPath)
    def buildCube(path: String): Unit =
      part.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"), sum(col("p_partkey")).as("sum_p_partkey"))
        .write.mode("overwrite").parquet(path)
    val cubeA = graft.RunPaths.scratch("graft_mvspec_tie_a")
    val cubeB = graft.RunPaths.scratch("graft_mvspec_tie_b")
    buildCube(cubeA); buildCube(cubeB)
    def reg(path: String): Unit = SummaryRewriteRule.register(partPath,
      SummaryRewriteRule.SummaryDef(path,
        dims = Set("p_brand"), measures = Set("p_partkey")))
    reg(cubeA); reg(cubeB)
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(SummaryRewriteRule)
    def q() = child.read.parquet(partPath)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    assert(scansOf(q()).exists(_.contains("graft_mvspec_tie_b")),
      "latest equal-width registration must win the tie")
    reg(cubeA) // re-register A: now A is the most recent
    assert(scansOf(q()).exists(_.contains("graft_mvspec_tie_a")),
      "tie-break must follow registration recency")
  }
}
