package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan shape assertions: these are the properties that keep the
  * declared queries viable at 100 TB — filter pushdown into the parquet
  * scan, column pruning, broadcast joins on dimension tables, partial
  * aggregation, and heap-based top-k. A regression here won't fail a
  * correctness test but would be a scale disaster, so it fails the build.
  */
class PlanSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q04: filters push down to the parquet scan") {
    val p = plan("q04_filter_pushdown")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_shipdate") && p.contains("l_discount") && p.contains("l_quantity"))
    // the scan must not read the full 11-column lineitem schema
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"column pruning failed: $readSchema")
  }

  test("q03: projection prunes the scan to 3 columns") {
    val p = plan("q03_project_rename")
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_returnflag"),
      s"column pruning failed: $readSchema")
  }

  test("q05: dimension joins broadcast") {
    val p = plan("q05_join_star")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q08: aggregation is partial (map-side) before the shuffle") {
    val p = plan("q08_agg_tpch_q1")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial"), "expected partial aggregation before exchange")
  }

  test("q13: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q07: range join is an equi-join on bucket keys, not nested loop") {
    val p = plan("q07_join_range")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join fell back to a quadratic join strategy")
  }

  test("whole-stage codegen covers the agg pipeline") {
    // AQE finalizes the plan only on execution; codegen'd operators are
    // then marked '*(id)' in the executed plan tree
    val df = SparkEntry.queries("q08_agg_tpch_q1")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      s"no WholeStageCodegen spans in:\n$p")
  }

  test("near-dup pipeline: no quadratic join strategies anywhere") {
    Seq("q23_jaccard_pairs", "q23_minhash_lsh", "q23_simhash")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"$q plans a quadratic join:\n$p")
      }
  }

  test("insight queries: no quadratic join strategies on the data paths") {
    // The scalar-combine crossJoins (1-row aggregates) in these plans
    // are BNLJ by design; what must never appear is a CartesianProduct
    // (a shuffle cartesian of full tables — blocking would have failed
    // in q35_edit_join, or the funnel/LM joins lost their keys).
    Seq("q35_funnel", "q35_edit_join", "q36_lm_score", "q38_pagerank",
      "q38_triangles", "q41_phrase_search")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"),
          s"$q plans a shuffle cartesian:\n$p")
      }
  }

  test("round-6 ops: pair generation stays equi-keyed, no shuffle cartesian") {
    // q56's tiny sign-matrix crossJoin (64×16 rows) and q56/q57's 1-row
    // count broadcasts are BNLJ by design (scalar combine); what must
    // never appear is a CartesianProduct — the DATA-path pair joins
    // (postings on the hashed term, reduced vectors on j) are equi-keyed
    // and would surface as a shuffle cartesian if they lost their keys.
    Seq("q54_leakage_safe_split", "q55_boilerplate_excise",
      "q56_jl_topk", "q57_sparse_cosine", "q58_balanced_shards").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q plans a shuffle cartesian:\n$p")
    }
  }

  test("q35_edit_join: candidates come from the variant equi-join") {
    val p = plan("q35_edit_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"vocabulary self-join fell back to nested loop:\n$p")
  }

  test("q24_cosine_pairs: broadcast pair enumeration, no shuffle cartesian") {
    // The exact all-pairs op is quadratic by SEMANTICS; the right plan
    // shape is a broadcast nested-loop pair enumeration feeding the
    // codegen'd dot fold — the prior index-explode "equi-join" shuffled
    // n²·d rows (measured 4 min vs seconds at sf0.1). A shuffle-based
    // CartesianProduct here would mean the broadcast was lost.
    val p = plan("q24_cosine_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q07_asof_sql: window rewrite avoids the nested-loop decorrelation") {
    // the correlated-subquery phrasing decorrelates to a BNLJ over
    // events x orders (measured unrunnable at sf0.1); the shipped SQL is
    // the union-sort window form — one shuffle, no nested loop
    val p = plan("q07_asof_sql")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"asof SQL plans a quadratic join:\n$p")
    assert(p.contains("Window"), p)
  }

  test("TPC-H subquery shapes decorrelate to hash joins, never nested loops") {
    // Q2 correlated min, Q4/Q21 correlated (NOT) EXISTS, Q11/Q15/Q22 scalar
    // subqueries, Q17 correlated avg: each must decorrelate to an
    // aggregate + equi-join (semi/anti where applicable). A BNLJ here is
    // the plan-shape failure that turns TB-scale runs quadratic.
    Seq("q05_sql_tpch_q2", "q05_sql_tpch_q4", "q05_sql_tpch_q11",
      "q05_sql_tpch_q15", "q05_sql_tpch_q17", "q05_sql_tpch_q21",
      "q05_sql_tpch_q22")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"$q plans a quadratic join:\n$p")
      }
  }

  test("excel scan prunes pushed columns") {
    // DSv2 SupportsPushDownRequiredColumns: reading 1 of 4 columns must
    // reach the reader (ExcelScan description carries required fields)
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_plan_fixture.xlsx").toString
    import graft.sources.excel.XlsxWriter
    import graft.sources.excel.XlsxWriter._
    XlsxWriter.write(path, Seq(Sheet.dense("s",
      Seq(Some(XShared("a")), Some(XShared("b")), Some(XShared("c"))) +:
        (1 to 3).map(i => Seq(Some(XNum(i)), Some(XNum(i)), Some(XNum(i)))))))
    val df = spark.read.format("excel").load(path).select("b")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ExcelScan") && p.contains("[b]"), p)
  }
}
