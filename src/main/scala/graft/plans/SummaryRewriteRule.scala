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

  /** Register `summary` as the pre-aggregation of the fact table whose
    * file-source root path is `factPath`.
    */
  def register(factPath: String, summary: SummaryDef): Unit =
    catalog.put(normalize(factPath), summary)

  def clear(): Unit = catalog.clear()

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, _, _, _) =>
      factOf(agg.child).flatMap(rewrite(agg, _)).getOrElse(agg)
  }

  /** The registered summary behind `child`, looking through pruning
    * projections and aliases.
    */
  private def factOf(child: LogicalPlan): Option[SummaryDef] = child match {
    case SubqueryAlias(_, inner) => factOf(inner)
    case Project(projectList, inner)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      factOf(inner)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.iterator
            .map(p => catalog.get(normalize(p.toString)))
            .collectFirst { case d if d != null => d }
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate, d: SummaryDef): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.dims.contains(a.name) => a
      case _ => return None
    }
    val summaryPlan = SparkSession.active.read
      .parquet(d.summaryPath).queryExecution.analyzed
    val sAttr: Map[String, Attribute] =
      summaryPlan.output.map(a => a.name -> a).toMap
    def col(name: String): Option[Attribute] = sAttr.get(name)

    def mapAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case c: Count if c.children == Seq(Literal(1)) =>
        col("cnt").map(Sum(_).toAggregateExpression())
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
          case Some(sa) => Alias(sa, a.name)(exprId = a.exprId)
          case None => return None
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
      case Some(sa) => sa
      case None => return None
    })
    Some(Aggregate(newGroups, rewritten, summaryPlan))
  }
}
