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
  * A summary registered via [[register]] declares, for one fact table
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
object SummaryRewriteRule extends Rule[LogicalPlan] {

  final case class SummaryDef(
      summaryPath: String, dims: Set[String], measures: Set[String])

  private val catalog = new ConcurrentHashMap[String, SummaryDef]()

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

  /** Register `summary` as the pre-aggregation of the fact table whose
    * file-source root path is `factPath`. Invalidate any cached plan
    * for the summary's path (and for the path of the definition this
    * one replaces): re-registering after a summary REBUILD is the
    * freshness handshake, and a pinned file listing from before the
    * rebuild would serve deleted part files — failed reads at best,
    * silently stale aggregates if old files linger.
    */
  def register(factPath: String, summary: SummaryDef): Unit = {
    val old = Option(catalog.put(normalize(factPath), summary))
    val stale = Set(summary.summaryPath) ++ old.map(_.summaryPath)
    planCache.keySet.removeIf(k => stale.contains(k._2))
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
        .flatMap { case (d, filters) => rewrite(agg, d, filters) }
        .getOrElse(agg)
  }

  /** The registered summary behind `child`, looking through pruning
    * projections, aliases, and — because count/sum/min/max over a
    * dims-restricted fact slice are still exactly answerable from the
    * summary (a dims filter keeps or drops whole summary groups) —
    * deterministic Filters, whose conditions are returned for
    * re-application over the summary. Eligibility of the collected
    * conditions (dims-only references) is checked in [[rewrite]].
    */
  private def factOf(
      child: LogicalPlan): Option[(SummaryDef, Seq[Expression])] = child match {
    case SubqueryAlias(_, inner) => factOf(inner)
    case Project(projectList, inner)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      factOf(inner)
    case Filter(cond, inner) if cond.deterministic =>
      factOf(inner).map { case (d, fs) => (d, cond +: fs) }
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
    // get-then-put instead of computeIfAbsent: LinkedHashMap's LRU
    // eviction hook is only reliably driven by put(); the benign race
    // (two threads analyzing the same summary once each) costs one
    // redundant file listing, not correctness
    val cacheKey = (idOf(session), d.summaryPath)
    val summaryPlan = freshInstance {
      val cached = planCache.get(cacheKey)
      if (cached != null) cached
      else {
        val analyzed =
          session.read.parquet(d.summaryPath).queryExecution.analyzed
        planCache.put(cacheKey, analyzed)
        analyzed
      }
    }
    val sAttr: Map[String, Attribute] =
      summaryPlan.output.map(a => a.name -> a).toMap
    def col(name: String): Option[Attribute] = sAttr.get(name)

    def mapAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case c: Count if c.children == Seq(Literal(1)) =>
        // coalesce: a GLOBAL count over an empty fact is 0, but a sum
        // over the (empty) summary would be NULL
        col("cnt").map(a =>
          Coalesce(Seq(Sum(a).toAggregateExpression(), Literal(0L))))
      case s: Sum => s.child match {
        case a: AttributeReference if d.measures.contains(a.name) =>
          col(s"sum_${a.name}").map(Sum(_).toAggregateExpression())
        case _ => None
      }
      case m: Min => m.child match {
        case a: AttributeReference if d.measures.contains(a.name) =>
          col(s"min_${a.name}").map(Min(_).toAggregateExpression())
        case _ => None
      }
      case m: Max => m.child match {
        case a: AttributeReference if d.measures.contains(a.name) =>
          col(s"max_${a.name}").map(Max(_).toAggregateExpression())
        case _ => None
      }
      case _ => None
    }

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
}
