package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Rewrites bounded time-range joins into bucketed equi-joins.
  *
  * A join whose condition contains the conjunct pair
  *
  *   b.ts > a.ts  AND  b.ts <= a.ts + INTERVAL w        (or >=/< variants)
  *
  * executes as a sort-merge join keyed only on whatever other equi
  * predicates exist (quadratic within each key group — every `a` meets
  * every `b` of the same key), or as a broadcast-nested-loop join when
  * there are none. Since `b.ts - a.ts` is bounded by `w`, bucketing both
  * sides into width-`w` epochs makes the pair co-located: `b` falls in
  * `a`'s bucket or the next one. The rule
  *
  *   - explodes the `a` side to its bucket and the successor bucket,
  *   - projects the `b` side's bucket,
  *   - joins on bucket equality (plus the original condition, which stays
  *     as the exact residual filter),
  *
  * turning the plan into a hash/sort-merge equi-join whose per-key groups
  * are O(rows per `w` window) — the shape that survives a 100 TB events
  * table. The 2x row expansion on the `a` side is the entire overhead.
  *
  * The bucket key is the bucket START (`t - pmod(t, w)`, exact floor for
  * all signs), not the quotient — same equality semantics, no division.
  *
  * Fires for `TimestampType` bounds with a foldable day-time or
  * calendar-interval width (months must be 0: month arithmetic is not a
  * fixed microsecond width). Idempotence: the generated bucket attribute
  * name is reserved; its presence in a child's output marks an already
  * rewritten join.
  *
  * Installed by [[graft.GraftExtensions]] (`injectOptimizerRule`) or via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketA = "__graft_range_bucket_a"
  private val BucketB = "__graft_range_bucket_b"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(_), _) if !alreadyBucketed(j) =>
      rewrite(j).getOrElse(j)
  }

  private def alreadyBucketed(j: Join): Boolean =
    (j.left.output ++ j.right.output).exists(a => a.name == BucketA || a.name == BucketB)

  /** Strip no-op casts (`SimplifyCasts` may not have run yet). */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if c.child.dataType == c.dataType => stripCast(c.child)
    case other => other
  }

  /** Interval width in microseconds, for fixed-width interval literals. */
  private def widthMicros(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _: DayTimeIntervalType) => Some(v)
    case Literal(ci: CalendarInterval, CalendarIntervalType) if ci.months == 0 =>
      Some(ci.days * 86400000000L + ci.microseconds)
    case _ => None
  }

  /** `b > a` / `b >= a` normalized to (base = a, probe = b). */
  private def lowerBound(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case GreaterThan(b: AttributeReference, a: AttributeReference) => Some((a, b))
      case GreaterThanOrEqual(b: AttributeReference, a: AttributeReference) => Some((a, b))
      case LessThan(a: AttributeReference, b: AttributeReference) => Some((a, b))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((a, b))
      case _ => None
    }

  /** `b <= a + w` / `b < a + w` normalized to (base, probe, width). */
  private def upperBound(e: Expression): Option[(AttributeReference, AttributeReference, Long)] = {
    def addParts(add: Expression): Option[(AttributeReference, Long)] = stripCast(add) match {
      case TimestampAddInterval(a: AttributeReference, w, _) => widthMicros(w).map((a, _))
      case _ => None
    }
    e match {
      case LessThanOrEqual(b: AttributeReference, add) => addParts(add).map { case (a, w) => (a, b, w) }
      case LessThan(b: AttributeReference, add) => addParts(add).map { case (a, w) => (a, b, w) }
      case GreaterThanOrEqual(add, b: AttributeReference) => addParts(add).map { case (a, w) => (a, b, w) }
      case GreaterThan(add, b: AttributeReference) => addParts(add).map { case (a, w) => (a, b, w) }
      case _ => None
    }
  }

  private def fromSide(side: LogicalPlan, a: AttributeReference): Boolean =
    side.outputSet.contains(a)

  /** Bucket start of `ts` in width-`w` epochs: exact floor via pmod. */
  private def bucketStart(ts: Expression, w: Long): Expression = {
    val micros = UnixMicros(ts)
    Subtract(micros, Pmod(micros, Literal(w, LongType)))
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val pairs = for {
      lo <- conjuncts.flatMap(lowerBound)
      (baseUp, probeUp, w) <- conjuncts.flatMap(upperBound)
      if lo == ((baseUp, probeUp)) && w > 0
      if baseUp.dataType == TimestampType && probeUp.dataType == TimestampType
    } yield (baseUp, probeUp, w)
    pairs.headOption.flatMap { case (base, probe, w) =>
      // the base (interval start) side gets exploded to two buckets
      val sides =
        if (fromSide(j.left, base) && fromSide(j.right, probe)) Some((j.left, j.right))
        else if (fromSide(j.right, base) && fromSide(j.left, probe)) Some((j.right, j.left))
        else None
      sides.map { case (baseSide, probeSide) =>
        val bucketA = AttributeReference(BucketA, LongType, nullable = true)()
        val exploded = Generate(
          Explode(CreateArray(Seq(
            bucketStart(base, w),
            Add(bucketStart(base, w), Literal(w, LongType))))),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(bucketA),
          child = baseSide)
        val bucketB = Alias(bucketStart(probe, w), BucketB)()
        val projected = Project(probeSide.output :+ bucketB, probeSide)
        val newCond = And(EqualTo(bucketA, bucketB.toAttribute), j.condition.get)
        val (newLeft, newRight) =
          if (baseSide eq j.left) (exploded, projected) else (projected, exploded)
        // restore the original join schema (the bucket columns are internal)
        Project(j.output,
          j.copy(left = newLeft, right = newRight, condition = Some(newCond)))
      }
    }
  }
}
