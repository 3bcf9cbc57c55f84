package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Materialized-summary rewrite: routes eligible aggregates over a FACT
  * table to a pre-computed SUMMARY table.
  *
  * At 100 TB the standard warehouse accelerator is a maintained cube:
  * `SELECT dims…, agg(measures…) FROM fact GROUP BY dims…` should read
  * the few-thousand-row summary, not re-scan the fact — including
  * ROLLUPS to any SUBSET of the summary's dimensions, because
  * count/sum/min/max are re-aggregable (count → sum of partial counts,
  * sum → sum of partial sums, min/max → min/max of partial extrema).
  * This rule performs that routing inside Catalyst, so users keep
  * writing the natural query against the fact table and the plan that
  * executes is the one that reads the summary.
  *
  * A fact may carry SEVERAL registered summaries (different dim
  * sets); each eligible query routes to the smallest one whose dims
  * cover its needs — see [[register]] and the catalog comment. A
  * summary registered via [[register]] declares, for one fact table
  * (identified by its file-source root path):
  *   - `dims`: the summary's grouping columns (same names as the fact);
  *   - a `cnt` column (= count(*) per dim combination);
  *   - `sum_<x>` / `min_<x>` / `max_<x>` columns for each pre-aggregated
  *     measure `<x>`.
  *
  * The rewrite fires only when it is provably exact:
  *   - the aggregate's child is the registered fact relation (possibly
  *     behind column pruning / subquery aliases);
  *   - every grouping expression is a plain fact column ⊆ `dims`;
  *   - every aggregate is non-distinct, unfiltered `count(1)`,
  *     `sum(col)`, `min(col)` or `max(col)` whose pre-aggregated
  *     column exists in the summary;
  *   - the rewritten aggregate's result TYPE equals the original's
  *     (rules out e.g. decimal sums, whose re-aggregation widens
  *     precision).
  * Anything else leaves the plan untouched. Output attribute ids are
  * preserved, so parent operators are unaffected.
  *
  * Installed per-session via `spark.experimental.extraOptimizations`
  * (the q07_range_rule pattern) — deliberately NOT injected globally:
  * a summary is only as fresh as its build job, and opting a session in
  * is the freshness contract.
  */
object SummaryRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** `rows`: the cube's measured row count, if the registrar knows it
    * (one tiny count right after the build — a summary is small by
    * contract). When EVERY cube registered for a fact carries it,
    * routing orders candidates by actual size; dim-set width is only
    * the fallback proxy (see the catalog comment for why width can
    * mispick).
    */
  final case class SummaryDef(
      summaryPath: String, dims: Set[String], measures: Set[String],
      rows: Option[Long] = None)

  // ALL summaries registered for one fact, kept sorted cheapest-first:
  // measured cubes first by row count (SummaryDef.rows), unmeasured
  // cubes after by fewest-dims (missing rows ≈ size unknown, assume
  // huge); ties broken by registration recency either way. A real warehouse maintains
  // several cubes per fact (different dim sets); each query routes to
  // the first candidate that rewrites — the smallest eligible cube.
  // Width is only a size proxy, and it MISPICKS exactly where dim sets
  // are incomparable: a global aggregate answerable from both a
  // high-cardinality 1-dim cube (per-customer, ~|customers| rows) and
  // a tiny 2-dim cube (status × priority, ~15 rows) would read the big
  // one under fewest-dims — measured rows route it to the tiny one
  // (q85_mv_costroute pins this). For dim sets related by SUBSET the
  // proxy is sound (adding dims never reduces distinct combinations).
  // Every candidate is exactness-checked by the same rewrite
  // machinery, so routing order is a COST choice, never a correctness
  // one.
  private val catalog = new ConcurrentHashMap[String, List[SummaryDef]]()

  // analyzed summary plans, one per (session UUID, path): re-analyzing
  // the summary read (file listing + footer schema) on EVERY eligible
  // query's planning would tax exactly the dashboard queries the rule
  // exists to accelerate. Keyed by sessionUUID — NOT identityHashCode,
  // whose values can be reused after GC and would hand a new session a
  // dead session's relation. Every substitution takes a FRESH instance
  // of the cached relation (new exprIds), so only the file listing +
  // schema work is amortized, never attribute identity.
  //
  // BOUNDED (LRU, access-order): each cached plan strongly references
  // its SparkSession through HadoopFsRelation, so a cache entry pins
  // the session — and that same pin means the weak sessionIds map can
  // never observe the session's death while the entry lives (circular
  // liveness: cache → plan → session → weak key). Weak-anchoring the
  // plans to their session therefore CANNOT work; instead the cache is
  // capped, so a newSession-per-query server accretes at most
  // MaxCachedPlans pinned (session, file-listing) pairs — bounded
  // steady-state, not a leak. An evicted entry costs one re-analysis
  // on next use.
  private val MaxCachedPlans = 64
  private val planCache: java.util.Map[(String, String), LogicalPlan] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, String), LogicalPlan](
          16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, String), LogicalPlan]): Boolean =
          size() > MaxCachedPlans
      })

  private[plans] def cachedPlanCount: Int = planCache.size()

  /** Register `summary` as one pre-aggregation of the fact table whose
    * file-source root path is `factPath`. Summaries ACCUMULATE per
    * fact (multiple cubes over different dim sets). Two shapes of
    * re-registration REPLACE instead of accumulating, and both
    * invalidate the replaced definitions' cached plans so a pinned
    * file listing from before a rebuild cannot serve deleted part
    * files — failed reads at best, silently stale aggregates if old
    * files linger:
    *   - same summaryPath: the in-place rebuild handshake;
    *   - same dims with measures covered by the new cube, under ANY
    *     path: the immutable-output rebuild pattern (each build writes
    *     a fresh directory) — the old cube is eligible for exactly the
    *     queries the new one answers, so keeping it routable would
    *     keep serving the stale build.
    * What register CANNOT infer is that a FACT DATA refresh staled the
    * fact's OTHER cubes (different dim sets — indistinguishable from
    * legitimate accumulation); after refreshing the underlying fact,
    * swap the whole cube set atomically with [[registerFresh]] (or
    * [[unregister]] then re-register). The stored list stays sorted
    * cheapest-first: cubes with a MEASURED row count
    * ([[SummaryDef.rows]]) first by rows, unmeasured cubes after by
    * fewest-dims — width is only a size proxy, and it mispicks exactly
    * where dim sets are incomparable (a global aggregate answerable
    * from both a high-cardinality 1-dim cube and a tiny 2-dim cube
    * must read the tiny one). The sort is stable over a newest-first
    * list, so equal-cost cubes prefer the most recent registration.
    */
  def register(factPath: String, summary: SummaryDef): Unit = {
    val stale = scala.collection.mutable.Set.empty[String]
    catalog.compute(normalize(factPath), (_, cur) => {
      val (superseded, rest) = (if (cur == null) Nil else cur).partition(s =>
        s.summaryPath == summary.summaryPath ||
          (s.dims == summary.dims && s.measures.subsetOf(summary.measures)))
      stale ++= superseded.map(_.summaryPath)
      ordered(summary :: rest)
    })
    stale += summary.summaryPath
    planCache.keySet.removeIf(k => stale.contains(k._2))
  }

  /** Cheapest-first routing order over a NEWEST-FIRST list: cubes with
    * a MEASURED row count sort first (by rows, then width), cubes
    * without one sort after ALL measured cubes (by width only) — a
    * missing measurement is treated as "size unknown, assume huge",
    * never as grounds to discard the measurements the other cubes DO
    * carry (the previous all-or-nothing rule let one legacy
    * registration without `rows` degrade the whole fact to the width
    * proxy — exactly the mispick measured routing exists to prevent).
    * The sort is stable, so equal-cost cubes keep their newest-first
    * relative order — the recency tie-break both register paths
    * promise.
    */
  private def ordered(newestFirst: List[SummaryDef]): List[SummaryDef] =
    newestFirst.sortBy(s =>
      (s.rows.isEmpty, s.rows.getOrElse(Long.MaxValue), s.dims.size))

  /** Atomically replace `factPath`'s WHOLE cube set — the handshake
    * after refreshing the fact's underlying data, which stales every
    * cube built over the old data no matter its dim set (a distinction
    * [[register]] cannot see; see its scaladoc). One `catalog.put` of
    * the pre-sorted list, so a concurrently-planning session sees
    * either the complete old set or the complete new set — never an
    * empty or partial catalog (unregister-then-register-each would
    * expose both windows, and a dashboard server swaps cube sets while
    * queries plan). Cached plans of every involved path are
    * invalidated: old ones are stale by definition, and new paths may
    * REUSE an old path (in-place rebuild) whose pinned file listing
    * predates the refresh.
    */
  def registerFresh(factPath: String, summaries: Seq[SummaryDef]): Unit = {
    // reverse: `ordered` expects newest-first, and register-one-by-one
    // semantics make the LAST element of the caller's seq the most
    // recent registration — equal-cost ties must prefer it
    val old = catalog.put(normalize(factPath),
      ordered(summaries.toList.reverse))
    val stale = (if (old == null) Nil else old).map(_.summaryPath).toSet ++
      summaries.map(_.summaryPath)
    planCache.keySet.removeIf(k => stale.contains(k._2))
  }

  /** Drop every summary registered for `factPath` (and their cached
    * plans) — the bulk form of the rebuild handshake, for callers
    * retiring a fact's whole cube set.
    */
  def unregister(factPath: String): Unit = {
    val old = catalog.remove(normalize(factPath))
    if (old != null) {
      val stale = old.map(_.summaryPath).toSet
      planCache.keySet.removeIf(k => stale.contains(k._2))
    }
  }

  def clear(): Unit = { catalog.clear(); planCache.clear() }

  // a UUID per live session, held WEAKLY: unlike identityHashCode (whose
  // values recur after GC and would hand a new session a dead session's
  // cached relation), a collected session's id — and with it any
  // planCache entries it anchored — can never be re-issued
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def idOf(session: SparkSession): String =
    sessionIds.computeIfAbsent(session,
      _ => java.util.UUID.randomUUID().toString)

  /** Scheme + authority + path — two buckets/filesystems with the same
    * directory layout must NOT collide in the catalog. Scheme-less
    * registrations and Hadoop-qualified rootPaths both normalize to the
    * `file` default, so local registration by plain path still matches.
    */
  private def normalize(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    val scheme = Option(u.getScheme).getOrElse("file")
    val auth = Option(u.getAuthority).getOrElse("")
    s"$scheme://$auth${u.getPath}"
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, _, _, _) =>
      factOf(agg.child)
        .flatMap { case (defs, filters) =>
          // cheapest-first (measured rows when known, else width —
          // see the catalog comment): the first candidate that
          // rewrites is the smallest exact cube for THIS query
          defs.iterator.flatMap(d => rewrite(agg, d, filters))
            .nextOption()
        }
        .orElse(rewriteOverJoin(agg))
        .getOrElse(agg)
  }

  /** The registered summary candidates behind `child` (cheapest
    * first — see the catalog comment), looking through pruning projections, aliases, and —
    * because count/sum/min/max over a dims-restricted fact slice are
    * still exactly answerable from a summary (a dims filter keeps or
    * drops whole summary groups) — deterministic Filters, whose
    * conditions are returned for re-application over the summary.
    * Eligibility of the collected conditions (dims-only references) is
    * checked per candidate in [[rewrite]].
    */
  private def factOf(
      child: LogicalPlan): Option[(List[SummaryDef], Seq[Expression])] =
    child match {
      case SubqueryAlias(_, inner) => factOf(inner)
      case Project(projectList, inner)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        factOf(inner)
      case Filter(cond, inner) if cond.deterministic =>
        factOf(inner).map { case (ds, fs) => (ds, cond +: fs) }
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            // ALL root paths must be the one registered fact: a
            // multi-path read (fact + extra dir) answered from a summary
            // of only the fact would silently drop the extra rows
            fs.location.rootPaths.map(p => normalize(p.toString)).distinct match {
              case Seq(single) => Option(catalog.get(single)).map((_, Nil))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  /** A fresh-attribute copy of the cached summary plan. Substituting
    * the cached instance VERBATIM would plant the same exprIds at every
    * rewrite site: one query with two eligible aggregates (a union of
    * rollups) would carry duplicate attribute ids across branches after
    * analysis-time DeduplicateRelations has already run — violating the
    * plan invariant downstream rules rely on.
    */
  private def freshInstance(plan: LogicalPlan): LogicalPlan = plan match {
    case lr: LogicalRelation => lr.newInstance()
    case other => other
  }

  /** A fresh-attributed analyzed plan of `d`'s summary for the active
    * session, through the bounded LRU cache. get-then-put instead of
    * computeIfAbsent: LinkedHashMap's LRU eviction hook is only
    * reliably driven by put(); the benign race (two threads analyzing
    * the same summary once each) costs one redundant file listing, not
    * correctness.
    */
  private def summaryFor(session: SparkSession, d: SummaryDef): LogicalPlan =
    freshInstance {
      val cacheKey = (idOf(session), d.summaryPath)
      val cached = planCache.get(cacheKey)
      if (cached != null) cached
      else {
        val analyzed =
          session.read.parquet(d.summaryPath).queryExecution.analyzed
        planCache.put(cacheKey, analyzed)
        analyzed
      }
    }

  /** Map one fact-side aggregate function onto its summary
    * re-aggregation, or None if not derivable.
    */
  private def mapAggWith(
      fn: AggregateFunction, d: SummaryDef,
      scol: String => Option[Attribute]): Option[Expression] = fn match {
    case c: Count if c.children == Seq(Literal(1)) =>
      // coalesce: a GLOBAL count over an empty fact is 0, but a sum
      // over the (empty) summary would be NULL
      scol("cnt").map(a =>
        Coalesce(Seq(Sum(a).toAggregateExpression(), Literal(0L))))
    case s: Sum => s.child match {
      case a: AttributeReference if d.measures.contains(a.name) =>
        scol(s"sum_${a.name}").map(Sum(_).toAggregateExpression())
      case _ => None
    }
    case m: Min => m.child match {
      case a: AttributeReference if d.measures.contains(a.name) =>
        scol(s"min_${a.name}").map(Min(_).toAggregateExpression())
      case _ => None
    }
    case m: Max => m.child match {
      case a: AttributeReference if d.measures.contains(a.name) =>
        scol(s"max_${a.name}").map(Max(_).toAggregateExpression())
      case _ => None
    }
    case _ => None
  }

  private def rewrite(
      agg: Aggregate, d: SummaryDef,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.dims.contains(a.name) => a
      case _ => return None
    }
    // every filter column must be a summary DIM: a dims-only predicate
    // selects whole summary groups, so pre-aggregated values are exact
    // under it; a measure/other-column predicate slices within groups
    // and the rewrite must decline
    filters.foreach { cond =>
      if (!cond.references.forall(a => d.dims.contains(a.name))) return None
    }
    val session = SparkSession.active
    val summaryPlan = summaryFor(session, d)
    val sAttr: Map[String, Attribute] =
      summaryPlan.output.map(a => a.name -> a).toMap
    def col(name: String): Option[Attribute] = sAttr.get(name)
    def mapAgg(fn: AggregateFunction): Option[Expression] =
      mapAggWith(fn, d, col)

    val rewritten = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        col(a.name) match {
          // same dataType required: the alias reuses the original
          // exprId, so a differently-typed summary dim would hand
          // parent operators an attribute whose type silently changed
          case Some(sa) if sa.dataType == a.dataType =>
            Alias(sa, a.name)(exprId = a.exprId)
          case _ => return None
        }
      // RENAMED group column (`SELECT status AS s, count(*) …`):
      // CollapseProject folds the rename into the aggregate list as
      // Alias(groupAttr, name) — same substitution as the bare
      // attribute, preserving the OUTER alias's name and exprId
      case al @ Alias(a: AttributeReference, name)
          if groupAttrs.exists(_.exprId == a.exprId) =>
        col(a.name) match {
          case Some(sa) if sa.dataType == a.dataType =>
            Alias(sa, name)(exprId = al.exprId)
          case _ => return None
        }
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        mapAgg(ae.aggregateFunction) match {
          case Some(e) if e.dataType == al.dataType =>
            Alias(e, name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    val newGroups = groupAttrs.map(a => col(a.name) match {
      case Some(sa) if sa.dataType == a.dataType => sa
      case _ => return None
    })
    // re-anchor the dims-only filters onto the summary's attributes
    // (same name, same type — a differently-typed summary dim would
    // silently change the predicate's semantics, so decline instead)
    val newFilters = filters.map(_.transform {
      case a: AttributeReference => col(a.name) match {
        case Some(sa) if sa.dataType == a.dataType => sa
        case _ => return None
      }
    })
    val child = newFilters.foldRight(summaryPlan)(Filter(_, _))
    Some(Aggregate(newGroups, rewritten, child))
  }

  /** The star-join dashboard shape: `Aggregate(Join(fact, dim))` →
    * `Aggregate(Join(summary, dim))` — grouping by dimension-table
    * columns, aggregating fact measures.
    *
    * EXACTNESS. Eligible only when every join conjunct is an equi
    * predicate between a fact column that is a SUMMARY DIM and a
    * column of the other side. Then summary groups are homogeneous in
    * the join key, so the inner join acts identically on group rows
    * and on fact rows: an unmatched key drops whole groups (exactly
    * the fact rows it would have dropped), and a key matching m dim
    * rows replicates each group row m times — sum-of-partial-sums and
    * sum-of-cnt replicate exactly like the underlying fact rows, and
    * min/max are replication-invariant. Aggregates must reference ONLY
    * the fact side (an aggregate over a dim column — e.g.
    * sum(d.population) — weights each dim value by fact-row
    * multiplicity, which the summary cannot reproduce: decline);
    * groupings may come from either side (dim-side groupings
    * re-partition whole group rows). Join types other than Inner
    * decline (outer joins fabricate null-extended rows at ROW
    * granularity). The non-fact side is substituted UNTOUCHED — its
    * attribute ids stay live for the parent aggregate.
    */
  /** Peel SubqueryAlias and attrs-only (pruning) Project wrappers —
    * the shapes Catalyst plants around relations and between nested
    * joins. Shared by join location and rebuild so the two can never
    * disagree about what counts as a wrapper.
    */
  private def stripAliases(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, inner) => stripAliases(inner)
    case Project(pl, inner)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripAliases(inner)
    case other => other
  }

  private def rewriteOverJoin(agg: Aggregate): Option[LogicalPlan] = {
    stripAliases(agg.child) match {
      case j: Join =>
        locateCandidates(j).iterator.flatMap {
          case (defs, filters, factSide, path) =>
            defs.iterator
              .flatMap(d => rewriteJoinChain(agg, d, filters, factSide, path))
        }.nextOption()
      case _ => None
    }
  }

  /** Walk a tree of INNER joins and return EVERY side that resolves to
    * a registered fact as a candidate: its summary candidates (cheapest
    * first — see the catalog comment), the fact-side filters factOf collected, the fact-side
    * subplan (for its outputSet), and the path of (join, factWentLeft)
    * from the fact-holding join OUTWARD to the root — the rebuild
    * order. ALL candidates, not "the unique fact": in a real warehouse
    * a DIM table may carry its own registered cube (nation with a
    * per-region summary), and a star query joining it as a dim must
    * not lose the FACT's rewrite just because the dim is also
    * registered — each candidate orientation is exactness-checked by
    * rewriteJoinChain (the non-candidate side is treated as an opaque
    * relation throughout the argument, so even a self-join is sound:
    * the orientation whose aggregates reference the substituted side
    * fires, the other declines). Non-inner and condition-less joins
    * yield no candidates.
    */
  private def locateCandidates(
      j: Join): List[(List[SummaryDef], Seq[Expression], LogicalPlan,
        List[(Join, Boolean)])] = {
    if (j.joinType != org.apache.spark.sql.catalyst.plans.Inner ||
        j.condition.isEmpty) return Nil
    def side(p: LogicalPlan, factLeft: Boolean): List[(List[SummaryDef],
        Seq[Expression], LogicalPlan, List[(Join, Boolean)])] = {
      val direct = factOf(p)
        .map { case (d, fs) => (d, fs, p, List((j, factLeft))) }.toList
      // column pruning plants attrs-only Projects between nested joins;
      // strip them on the fact spine — the rebuild omits them (their
      // lists name original fact attrs that substitution would dangle;
      // dropping a pruning Project is semantics-free, and the rebuilt
      // spine is summary + dims, all model-scale)
      val nested = stripAliases(p) match {
        case inner: Join => locateCandidates(inner).map {
          case (d, fs, f, path) => (d, fs, f, path :+ ((j, factLeft)))
        }
        case _ => Nil
      }
      direct ++ nested
    }
    side(j.left, factLeft = true) ++ side(j.right, factLeft = false)
  }

  /** Rebuild the located join chain with the filtered summary in the
    * fact's place. Per-conjunct legality at EVERY level: a conjunct
    * referencing no fact attribute passes through unchanged if
    * deterministic (it filters the dim cross-product identically at
    * group and at row granularity — this covers snowflake links like
    * `s_nationkey = n_nationkey` and dim-only range predicates); a
    * conjunct referencing the fact must be an equi predicate between a
    * summary DIM and a non-fact column, re-anchored onto the summary.
    * The fact-holding join must carry at least one such equi key (a
    * keyless fact join would rebuild as a nested-loop against the
    * summary — legal but a plan-shape regression; decline).
    */
  private def rewriteJoinChain(
      agg: Aggregate, d: SummaryDef, filters: Seq[Expression],
      factSide: LogicalPlan, path: List[(Join, Boolean)]): Option[LogicalPlan] = {
    val factOut = factSide.outputSet
    filters.foreach { c =>
      if (!c.references.forall(a => d.dims.contains(a.name))) return None
    }
    val session = SparkSession.active
    val summaryPlan = summaryFor(session, d)
    val sAttr: Map[String, Attribute] =
      summaryPlan.output.map(a => a.name -> a).toMap
    def scol(name: String): Option[Attribute] = sAttr.get(name)
    // re-anchor a fact attribute onto the summary, same name AND type
    def sOf(a: AttributeReference): Option[Attribute] =
      scol(a.name).filter(_.dataType == a.dataType)

    // (rebuilt condition, number of re-anchored fact-equi conjuncts)
    def rebuildCond(cond: Expression): Option[(Expression, Int)] = {
      var keyed = 0
      val parts = splitConjunctivePredicates(cond).map {
        case c if c.references.intersect(factOut).isEmpty =>
          if (c.deterministic) c else return None
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if factOut.contains(a) && !factOut.contains(b) &&
              d.dims.contains(a.name) =>
          keyed += 1
          EqualTo(sOf(a).getOrElse(return None), b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if factOut.contains(b) && !factOut.contains(a) &&
              d.dims.contains(b.name) =>
          keyed += 1
          EqualTo(sOf(b).getOrElse(return None), a)
        case _ => return None
      }
      Some((parts.reduce(And), keyed))
    }

    val newFilters = filters.map(_.transform {
      case a: AttributeReference => sOf(a).getOrElse(return None)
    })
    var rebuilt: LogicalPlan = newFilters.foldRight(summaryPlan)(Filter(_, _))
    var level = 0
    for ((j, factLeft) <- path) {
      val (cond, keyed) = rebuildCond(j.condition.get).getOrElse(return None)
      if (level == 0 && keyed == 0) return None
      val other = if (factLeft) j.right else j.left
      rebuilt =
        if (factLeft)
          Join(rebuilt, other, org.apache.spark.sql.catalyst.plans.Inner,
            Some(cond), j.hint)
        else
          Join(other, rebuilt, org.apache.spark.sql.catalyst.plans.Inner,
            Some(cond), j.hint)
      level += 1
    }

    val newGroups = agg.groupingExpressions.map {
      case a: AttributeReference if !factOut.contains(a) => a
      case a: AttributeReference if d.dims.contains(a.name) =>
        sOf(a).getOrElse(return None)
      case _ => return None
    }
    val groupIds = agg.groupingExpressions.collect {
      case a: AttributeReference => a.exprId
    }.toSet
    val rewritten = agg.aggregateExpressions.map {
      case a: AttributeReference
          if groupIds.contains(a.exprId) && !factOut.contains(a) =>
        a // dim-side grouping column: same live attribute
      case a: AttributeReference if groupIds.contains(a.exprId) =>
        // fact-side grouping column: summary attribute under the
        // original exprId so parents are unaffected
        Alias(sOf(a).getOrElse(return None), a.name)(exprId = a.exprId)
      // renamed group column (CollapseProject-folded) — dim-side stays
      // live as-is, fact-side re-anchors under the outer alias's exprId
      case al @ Alias(a: AttributeReference, _)
          if groupIds.contains(a.exprId) && !factOut.contains(a) =>
        al
      case al @ Alias(a: AttributeReference, name)
          if groupIds.contains(a.exprId) =>
        Alias(sOf(a).getOrElse(return None), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty &&
            ae.references.subsetOf(factOut) =>
        // fact-only aggregates re-aggregate from the summary; an
        // aggregate over a DIM column would weight dim values by
        // fact-row multiplicity, which the summary cannot reproduce —
        // the catch-all below declines it
        mapAggWith(ae.aggregateFunction, d, scol) match {
          case Some(e) if e.dataType == al.dataType =>
            Alias(e, name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    Some(Aggregate(newGroups, rewritten, rebuilt))
  }
}
