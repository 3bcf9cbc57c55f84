package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, ShortType, TimestampType}

/** Rewrites natural-SQL containment joins into [[PointInIntervalJoin]].
  *
  * An inner join whose condition is exactly
  *
  *   (equi keys...) AND p >= lo AND (p < hi | p <= hi)
  *
  * with the point on one side, both bounds on the other, and the bound
  * side small enough to broadcast (`autoBroadcastJoinThreshold`), plans
  * by default as a broadcast NESTED-LOOP join — every probe row scans
  * every build row. The rewrite swaps in the custom operator's per-key
  * binary-search probe ([[PointInIntervalJoinExec]]) with identical
  * semantics, including BETWEEN's inclusive upper bound and
  * null-never-matches for keys, points, and bounds.
  *
  * Fires only when every conjunct is consumed (equi keys + the two
  * bounds — any residual predicate means this isn't a pure containment
  * join) and all three range expressions are orderable fixed-point
  * attributes (timestamp/date/integral). Same philosophy as
  * [[RangeJoinRule]]: users write the natural predicate; the plan that
  * executes is the one that survives scale. Installed by
  * [[graft.GraftExtensions]] or `IntervalJoin.install` (which pairs it
  * with the strategy that plans the node).
  */
object IntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val okType: DataType => Boolean = {
    case LongType | TimestampType | IntegerType | DateType | ShortType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(_), _) => rewrite(j).getOrElse(j)
  }

  /** (point, bound, inclusive) for a conjunct that is a lower bound
    * `p >= lo` in any spelling; upper bounds analogous. */
  private def asLower(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case GreaterThanOrEqual(p: AttributeReference, lo: AttributeReference) => Some((p, lo))
      case LessThanOrEqual(lo: AttributeReference, p: AttributeReference) => Some((p, lo))
      case _ => None
    }

  private def asUpper(e: Expression): Option[(AttributeReference, AttributeReference, Boolean)] =
    e match {
      case LessThan(p: AttributeReference, hi: AttributeReference) => Some((p, hi, false))
      case GreaterThan(hi: AttributeReference, p: AttributeReference) => Some((p, hi, false))
      case LessThanOrEqual(p: AttributeReference, hi: AttributeReference) => Some((p, hi, true))
      case GreaterThanOrEqual(hi: AttributeReference, p: AttributeReference) => Some((p, hi, true))
      case _ => None
    }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val leftSet = j.left.outputSet
    val rightSet = j.right.outputSet

    // try both orientations; probe side holds the point
    def attempt(probe: LogicalPlan, build: LogicalPlan): Option[LogicalPlan] = {
      val probeSet = probe.outputSet
      val buildSet = build.outputSet
      var point: AttributeReference = null
      var lo: AttributeReference = null
      var hi: AttributeReference = null
      var hiInclusive = false
      val probeKeys = scala.collection.mutable.ArrayBuffer.empty[Expression]
      val buildKeys = scala.collection.mutable.ArrayBuffer.empty[Expression]

      val allConsumed = conjuncts.forall {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if probeSet.contains(a) && buildSet.contains(b) =>
          probeKeys += a; buildKeys += b; true
        case EqualTo(b: AttributeReference, a: AttributeReference)
            if probeSet.contains(a) && buildSet.contains(b) =>
          probeKeys += a; buildKeys += b; true
        case c if asLower(c).exists { case (p, l) =>
            probeSet.contains(p) && buildSet.contains(l) } && lo == null =>
          val (p, l) = asLower(c).get
          if (point == null || point.semanticEquals(p)) { point = p; lo = l; true }
          else false
        case c if asUpper(c).exists { case (p, h, _) =>
            probeSet.contains(p) && buildSet.contains(h) } && hi == null =>
          val (p, h, inc) = asUpper(c).get
          if (point == null || point.semanticEquals(p)) {
            point = p; hi = h; hiInclusive = inc; true
          } else false
        case _ => false
      }

      if (!allConsumed || point == null || lo == null || hi == null) return None
      if (!okType(point.dataType) || !okType(lo.dataType) || !okType(hi.dataType))
        return None
      // only fire when the build side is actually broadcastable
      val threshold = conf.autoBroadcastJoinThreshold
      if (threshold < 0 || build.stats.sizeInBytes > threshold) return None

      val node = PointInIntervalJoin(probe, build, point, lo, hi,
        probeKeys.toSeq, buildKeys.toSeq, hiInclusive)
      // node output is probe++build; restore the Join's left++right order
      Some(if (probe eq j.left) node else Project(j.output, node))
    }

    attempt(j.left, j.right).orElse(attempt(j.right, j.left))
  }
}
