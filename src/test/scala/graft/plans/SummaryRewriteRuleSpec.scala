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

  test("a filter below the aggregate blocks the rewrite") {
    // a WHERE on the fact cannot be answered from the cube (the summary
    // has no per-row data) — the child is Filter(relation), which the
    // matcher must not look through
    val child = childWithRule()
    val df = child.read.parquet(factPath)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    assert(scansOf(df).exists(_.contains("lineitem")))
    assert(!scansOf(df).exists(_.contains("graft_mvspec_summary")))
  }
}
