package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, IntegerLiteral, IsNull, Or}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.expressions.{Window => WSpec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Registry-wide ban on partition-less windows over corpus-scale input.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves every
  * input row through ONE task — the scale cliff
  * [[graft.operators.GlobalIndex]] exists to avoid, and the defect the
  * round-6 audit found in q44_rrf_fusion. This guard walks the
  * OPTIMIZED logical plan of every registered query and requires each
  * partition-less Window to sit over an input with a PROVABLE row
  * bound ≤ [[WindowGuard.DriverScale]]:
  *
  *   - `GlobalLimit(k)` — distributed top-k (TakeOrderedAndProject)
  *     feeding a k-row rank attach, the q44 fix shape;
  *   - ungrouped `Aggregate` — a 1-row scalar;
  *   - `Aggregate` grouped solely on GlobalIndex partition ids
  *     (`_gi_pid`, ≤ numPartitions rows by construction —
  *     GlobalIndex.scala:53-57, the documented offset-table windows);
  *   - `LocalRelation` — literal probe tables;
  *   - joins/unions/expands of bounded inputs (bounds compose).
  *
  * Anything else — in particular a scan, Generate, or grouped
  * aggregate on a data column — is corpus-scale, and a partition-less
  * window over it fails the build. Streaming drives execute their
  * windows inside the micro-batch run before returning a result table,
  * so their plans are asserted in the streaming specs instead.
  */
object WindowGuard {

  /** Inputs provably at or under this many rows are driver-scale. */
  val DriverScale: BigInt = BigInt(100000)

  /** GlobalIndex's offset aggregate is bounded by the partition count;
    * this is generous headroom over any sane `spark.sql.shuffle
    * .partitions` (a 1000-executor cluster runs tens of thousands).
    */
  private val MaxPartitions: BigInt = BigInt(65536)

  /** Upper bound on the rows `plan` can emit, or None if corpus-scale.
    * Conservative: unknown operators (scans, Generate, ...) are
    * unbounded; only row-preserving/reducing operators pass a child's
    * bound through.
    */
  def rowBound(plan: LogicalPlan): Option[BigInt] = plan match {
    case GlobalLimit(IntegerLiteral(n), child) =>
      rowBound(child).map(_ min BigInt(n)).orElse(Some(BigInt(n)))
    case l: LocalRelation => Some(BigInt(l.data.size))
    case _: OneRowRelation => Some(BigInt(1))
    case r: Range => Some(r.numElements)
    case a: Aggregate =>
      if (a.groupingExpressions.isEmpty) Some(BigInt(1))
      else if (a.groupingExpressions.forall {
        case att: Attribute => att.name == "_gi_pid"
        case _ => false
      }) Some(MaxPartitions)
      else rowBound(a.child) // grouping never grows rows
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => rowBound(j.left)
      case _ =>
        for (l <- rowBound(j.left); r <- rowBound(j.right))
          yield l * r + l + r // inner ≤ l*r; outer adds unmatched sides
    }
    case u: Union =>
      val bs = u.children.map(rowBound)
      if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
    case e: Expand => rowBound(e.child).map(_ * e.projections.size)
    case p: Project => rowBound(p.child)
    case f: Filter => rowBound(f.child)
    case s: Sort => rowBound(s.child)
    case w: Window => rowBound(w.child)
    case s: SubqueryAlias => rowBound(s.child)
    case l: LocalLimit => rowBound(l.child)
    case r: Repartition => rowBound(r.child)
    case r: RepartitionByExpression => rowBound(r.child)
    case d: Distinct => rowBound(d.child)
    case d: Deduplicate => rowBound(d.child)
    case _ => None
  }

  /** (windowNode, bound) for every partition-less Window in `plan`
    * whose input is NOT provably driver-scale.
    */
  def violations(plan: LogicalPlan): Seq[Window] =
    plan.collect {
      case w: Window if w.partitionSpec.isEmpty &&
        !rowBound(w.child).exists(_ <= DriverScale) => w
    }

  /** Joins with no equi-key can only execute as
    * BroadcastNestedLoopJoin or CartesianProduct — O(|left|·|right|)
    * comparisons. Safe at 100 TB only when one side is provably tiny
    * (the build/broadcast side streams against the big side). The
    * bound mirrors the exact-all-pairs refusal threshold
    * ([[graft.queries.LlmOps.MaxExactAllPairs]]).
    */
  val CrossScale: BigInt = BigInt(graft.queries.LlmOps.MaxExactAllPairs)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Does the join carry at least one left↔right attribute equality
    * (i.e. can Spark pick a hash/sort-merge strategy)? Literal
    * equalities don't count — they filter, they don't key.
    */
  def hasEquiKeys(j: Join): Boolean = {
    def split(a: Expression, b: Expression): Boolean = {
      val (ar, br) = (a.references, b.references)
      ar.nonEmpty && br.nonEmpty &&
        ((ar.subsetOf(j.left.outputSet) && br.subsetOf(j.right.outputSet)) ||
         (br.subsetOf(j.left.outputSet) && ar.subsetOf(j.right.outputSet)))
    }
    def splitEq(e: Expression): Boolean = e match {
      case EqualTo(a, b)       => split(a, b)
      case EqualNullSafe(a, b) => split(a, b)
      case _                   => false
    }
    j.condition.toSeq.flatMap(conjuncts).exists {
      case e if splitEq(e) => true
      // NOT IN → null-aware anti join: `a = b OR isnull(a = b)`.
      // Spark executes the single-column form as a null-aware
      // BroadcastHashJoin, not a nested loop.
      case Or(e1, IsNull(e2)) if j.joinType == LeftAnti =>
        splitEq(e1) && splitEq(e2)
      case Or(IsNull(e2), e1) if j.joinType == LeftAnti =>
        splitEq(e1) && splitEq(e2)
      case _ => false
    }
  }

  /** Every equi-key-less join where NEITHER side has a provable row
    * bound ≤ [[CrossScale]] — the nested-loop scale cliff a future
    * query must not silently reintroduce.
    */
  def crossViolations(plan: LogicalPlan): Seq[Join] = plan.collect {
    case j: Join if !hasEquiKeys(j) &&
      !(rowBound(j.left).exists(_ <= CrossScale) ||
        rowBound(j.right).exists(_ <= CrossScale)) => j
  }
}

class WindowGuardSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      graft.RunPaths.scratch("graft_warehouse_wg"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("guard is red on an unfiltered corpus-scale global-numbering window") {
    // Negative control. Note the round-6 q44 formulation proper —
    // rank-then-filter(r <= 50) — is ALREADY rescued by Catalyst:
    // Spark 4.1's LimitPushDownThroughWindow/InferWindowGroupLimit
    // rewrites a rank predicate adjacent to a partition-less row_number
    // into Window-over-GlobalLimit(k) (verified below), which this
    // guard then proves bounded. The shape the optimizer CANNOT rescue
    // is global numbering with no rank predicate — every corpus row
    // through one WindowExec task, the GlobalIndex-motivating cliff —
    // and that is what the guard must flag.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val numbered = docs.select(col("doc_id").as("id"),
        col("n_chars").cast("double").as("score"))
      .withColumn("r", row_number().over(
        WSpec.orderBy(col("score").desc, col("id").asc)))
    assert(WindowGuard.violations(numbered.queryExecution.optimizedPlan).nonEmpty,
      "guard failed to flag a corpus-scale partition-less window")
  }

  test("Catalyst rewrites rank-then-filter to a bounded window (documented rescue)") {
    // Pins the optimizer behavior the negative control's comment
    // relies on: if a Spark upgrade ever stops rewriting the r6 q44
    // formulation into Window-over-GlobalLimit, this fails and the
    // guard's documentation (and any code leaning on the rescue) must
    // be revisited.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val old = docs.select(col("doc_id").as("id"),
        col("n_chars").cast("double").as("score"))
      .withColumn("r", row_number().over(
        WSpec.orderBy(col("score").desc, col("id").asc)))
      .filter(col("r") <= 50)
    val plan = old.queryExecution.optimizedPlan
    assert(plan.collect { case g: GlobalLimit => g }.nonEmpty,
      s"expected Catalyst to push a limit below the rank filter:\n$plan")
    assert(WindowGuard.violations(plan).isEmpty)
  }

  test("guard is green on the fixed top-k-then-rank shape") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fixed = graft.queries.Semantic.topKRanked(
      docs.select(col("doc_id").as("id"),
        col("n_chars").cast("double").as("score")),
      "score", "r", 50)
    val plan = fixed.queryExecution.optimizedPlan
    // the rank window is still partition-less, but over GlobalLimit(50)
    assert(plan.collect { case w: Window if w.partitionSpec.isEmpty => w }.nonEmpty)
    assert(WindowGuard.violations(plan).isEmpty)
  }

  test("guard recognizes the GlobalIndex offset-table window as driver-scale") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val indexed = graft.operators.GlobalIndex.withPosition(
      docs, Seq(col("doc_id")), "pos", 4)
    assert(WindowGuard.violations(indexed.queryExecution.optimizedPlan).isEmpty)
  }

  // Queries whose partition-less windows ARE driver-scale but whose
  // bound the estimator cannot prove: the PQ codebook-densify rank
  // (ProductQuantizer.scala:107) runs over the trained codebook —
  // m·ksub rows (e.g. 8×256 = 2048), a model-scale object grouped by
  // (sub_id, code) whose domain the plan doesn't carry. Every entry
  // must still TRIGGER the guard (anti-rot assertion below): if the
  // query is restructured so the bound becomes provable, the stale
  // whitelist row fails the build and must be deleted.
  private val boundedByDomain: Map[String, String] = Map(
    "q24_pq_train" -> "codebook densify rank: m*ksub rows (model-scale)",
    "q24_ann_pq" -> "codebook densify rank inside train(): m*ksub rows",
    "q24_ann_ivfpq" -> "residual codebook densify rank: m*ksub rows",
    "q68_ann_incremental" ->
      "from-scratch comparison index's codebook densify rank: m*ksub rows")

  // One sweep serves both registry guards: builds every registered
  // query's DataFrame (constructor side effects run — for the
  // lifecycle entries that means the whole streamed harness) and
  // collects the optimized plan's window and cross-join violations.
  // The sweep runs 8-way PARALLEL (r16 suite-wall-time budget: the
  // serial sweep was 6m38s, 29 % of the whole suite, dominated by
  // re-running independent lifecycle harnesses back to back).
  // Safe by construction: every query's scratch tree is keyed by its
  // own (name, dir), the ensure* fixture caches are computeIfAbsent-
  // serialized, Spark sessions schedule concurrent jobs, and the only
  // session-global conf the bodies set (maxMetadataStringLength) is
  // set to the same value everywhere. EXCEPTION (r16 ADVICE): the
  // summary-rewrite entries (q83_mv_bestmatch / q85_mv_costroute)
  // mutate the shared SummaryRewriteRule catalog — both
  // unregister(factPath) then register their own cubes and
  // plan-require routing to them, so racing them lets one entry
  // unregister the other's cubes between register and plan
  // construction. They run SEQUENTIALLY in one future; everything
  // else stays 8-way parallel.
  private val catalogMutating = Set("q83_mv_bestmatch", "q85_mv_costroute")

  private lazy val sweep: Map[String, (Seq[Window], Seq[Join])] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    def runOne(q: graft.queries.QueryDef): (String, (Seq[Window], Seq[Join])) = {
      val df =
        try q.run(spark, sf)
        catch { case e: Throwable =>
          fail(s"${q.name} failed to construct: ${e.getMessage}", e)
        }
      val plan = df.queryExecution.optimizedPlan
      q.name ->
        (WindowGuard.violations(plan), WindowGuard.crossViolations(plan))
    }
    try {
      val (serial, parallel) =
        SparkEntry.registry.partition(q => catalogMutating.contains(q.name))
      val futures: Seq[Future[Seq[(String, (Seq[Window], Seq[Join]))]]] =
        parallel.map(q => Future(Seq(runOne(q)))) :+ Future(serial.map(runOne))
      Await.result(Future.sequence(futures), 30.minutes).flatten.toMap
    } finally pool.shutdown()
  }

  test("no partition-less corpus-scale window anywhere in the registry") {
    val flagged = sweep.view.mapValues(_._1).toMap
    val bad = flagged.collect {
      case (name, ws) if ws.nonEmpty && !boundedByDomain.contains(name) =>
        s"$name: partition-less window over unbounded input:\n" +
          ws.head.child.treeString.linesIterator.take(12).mkString("\n")
    }
    assert(bad.isEmpty, bad.mkString("\n\n"))
    // anti-rot: a whitelisted query that no longer trips the guard
    // means the whitelist entry is stale — remove it
    val stale = boundedByDomain.keys.filter(n => flagged.getOrElse(n, Nil).isEmpty)
    assert(stale.isEmpty,
      s"stale whitelist entries (guard no longer fires): ${stale.mkString(", ")}")
  }

  test("cross-join guard is red on a deliberately unbounded crossJoin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = docs.select(col("doc_id").as("a_id"))
    val b = docs.select(col("doc_id").as("b_id"))
    val cross = a.crossJoin(b).filter(col("a_id") < col("b_id"))
    assert(WindowGuard.crossViolations(cross.queryExecution.optimizedPlan).nonEmpty,
      "guard failed to flag an unbounded corpus × corpus nested-loop join")
    // and green when one side is provably tiny (broadcastable build)
    val tiny = a.crossJoin(b.limit(8))
    assert(WindowGuard.crossViolations(tiny.queryExecution.optimizedPlan).isEmpty)
  }

  // Equi-key-less joins whose small side IS provably tiny by
  // construction, but whose bound the estimator cannot carry through
  // the plan (localCheckpoint severs lineage into a LogicalRDD; a
  // cached model table scans as a parquet relation). Same anti-rot
  // contract as boundedByDomain: every entry must still TRIGGER the
  // guard, so a restructure that makes the bound provable fails the
  // build until the stale row is deleted.
  private val crossBoundedByDomain: Map[String, String] = Map(
    "q02_convert_split" -> ("8-row per-part-file stats behind an eager " +
      "localCheckpoint (lineage severed to avoid re-running the convert); " +
      "the distributed order contract is a theta self-join of those 8 rows"),
    "q42_gapfill" -> ("derived-dimension spine cross join: hour sequence " +
      "(Generate over a 1-row bounds aggregate) × distinct event types — " +
      "both sides derived dimensions, sized hours × types, not corpus rows"),
    "q45_centroid_assign" -> ("label-centroid table: grouped aggregate " +
      "whose cardinality is the label domain (10), broadcast against the " +
      "corpus scan — the estimator cannot carry a group-domain bound"))

  test("no unbounded nested-loop join anywhere in the registry") {
    val flagged = sweep.view.mapValues(_._2).toMap
    val bad = flagged.collect {
      case (name, js) if js.nonEmpty && !crossBoundedByDomain.contains(name) =>
        s"$name: equi-key-less join with no provably tiny side:\n" +
          js.head.treeString.linesIterator.take(12).mkString("\n")
    }
    assert(bad.isEmpty, bad.mkString("\n\n"))
    val stale = crossBoundedByDomain.keys.filter(n => flagged.getOrElse(n, Nil).isEmpty)
    assert(stale.isEmpty,
      s"stale cross whitelist entries (guard no longer fires): ${stale.mkString(", ")}")
  }
}
