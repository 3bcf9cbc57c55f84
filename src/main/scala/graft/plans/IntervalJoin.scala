package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, ShortType, TimestampType}

/** Broadcast point-in-interval join: each probe row pairs with every
  * build row of the same key whose half-open interval `[lo, hi)`
  * contains the probe's point — the lookup shape behind SCD2
  * dimension resolution, IP/time-range enrichment, and
  * config-epoch assignment in a training pipeline.
  *
  * Why a whole-operator extension (preference (c)) and not composition:
  * Catalyst plans `p >= lo AND p < hi` joins as a broadcast
  * NESTED-LOOP join — O(|probe| x |build|) comparisons — because a
  * containment predicate has no equi-key; the bucketing rewrite
  * ([[RangeJoinRule]]) needs a known bounded width, which containment
  * against arbitrary-width intervals does not have. This operator keeps
  * the broadcast (the build side is a dimension; no shuffle of the
  * probe side at all) but replaces the inner loop with a per-key
  * binary search over lo-sorted intervals plus a prefix-max(hi) early
  * stop: O(log n + matches) per probe row against skewed or
  * overlapping interval sets. At 100 TB the probe side streams
  * map-side only — the plan's single exchange is the build-side
  * broadcast, exactly like a broadcast hash join.
  *
  * Pieces (the full custom-operator stack, installed by
  * [[graft.GraftExtensions]] `injectPlannerStrategy` or per-session via
  * `spark.experimental.extraStrategies`):
  *   - [[PointInIntervalJoin]] — logical `BinaryNode`
  *   - [[IntervalJoinStrategy]] — `SparkStrategy` planning it
  *   - [[PointInIntervalJoinExec]] — physical `BinaryExecNode` with a
  *     `BroadcastDistribution(IdentityBroadcastMode)` requirement, so
  *     `EnsureRequirements` inserts the standard reusable
  *     `BroadcastExchangeExec`
  *   - [[IntervalJoin.pointInInterval]] — the public DataFrame API
  *
  * Point/lo/hi must be orderable fixed-point types (timestamp, date,
  * integral); null points or bounds never match (inner-join
  * semantics). Output columns: probe side's then build side's.
  */
object IntervalJoin {

  /** Inner-join `probe` to `build` on key equality and
    * `build.lo <= probe.point < build.hi`. Column arguments are names
    * resolved against the respective side (prepare derived columns on
    * the input frames first). The build side must be broadcastable.
    */
  def pointInInterval(
      probe: DataFrame,
      build: DataFrame,
      point: String,
      lo: String,
      hi: String,
      probeKeys: Seq[String] = Nil,
      buildKeys: Seq[String] = Nil): DataFrame = {
    require(probeKeys.length == buildKeys.length,
      "probeKeys and buildKeys must pair up")
    val spark = probe.sparkSession
    val lp = GraftColumnBridge.analyzed(probe)
    val rp = GraftColumnBridge.analyzed(build)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val node = PointInIntervalJoin(lp, rp,
      resolve(lp, point), resolve(rp, lo), resolve(rp, hi),
      probeKeys.map(resolve(lp, _)), buildKeys.map(resolve(rp, _)))
    GraftColumnBridge.ofRows(spark, node)
  }

  /** Install the strategy AND the natural-SQL rewrite rule on a live
    * session (static `spark.sql.extensions` cannot apply to an existing
    * context; same pattern as `extraOptimizations` for
    * [[RangeJoinRule]]). Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies = cur :+ IntervalJoinStrategy
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(IntervalJoinRule))
      spark.experimental.extraOptimizations = rules :+ IntervalJoinRule
  }
}

/** Logical form: constructed with resolved child attributes only, so the
  * node passes analysis untouched and survives to planning.
  * `hiInclusive` selects `p <= hi` (BETWEEN phrasing) vs the default
  * half-open `p < hi`.
  */
case class PointInIntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    hiInclusive: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointInIntervalJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointInIntervalJoin(l, r, point, lo, hi, lk, rk, hiInc) =>
      PointInIntervalJoinExec(point, lo, hi, lk, rk, hiInc,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class PointInIntervalJoinExec(
    point: Expression,
    lo: Expression,
    hi: Expression,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    hiInclusive: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  /** Orderable fixed-point eval: timestamps/longs eval to Long; date/
    * int/short to Int. Comparison happens in the widened Long domain.
    */
  private def toLong(dt: DataType): Any => Long = dt match {
    case LongType | TimestampType => v => v.asInstanceOf[Long]
    case IntegerType | DateType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case other => throw new IllegalArgumentException(
      s"interval join bound must be an orderable fixed-point type, got $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val boundPoint = BindReferences.bindReference(point, left.output)
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    val pointToLong = toLong(point.dataType)
    val loToLong = toLong(lo.dataType)
    val hiToLong = toLong(hi.dataType)
    val lKeys = leftKeys
    val rKeys = rightKeys
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output

    left.execute().mapPartitions { probeIter =>
      // ---- build the per-key sorted index once per partition ----
      val buildKeyProj = UnsafeProjection.create(
        rKeys.map(BindReferences.bindReference(_, rightOut)))
      val index = new java.util.HashMap[UnsafeRow, IntervalIndex]()
      val grouped = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
      broadcastRows.value.foreach { row =>
        val loV = boundLo.eval(row)
        val hiV = boundHi.eval(row)
        val key = buildKeyProj(row)
        // SQL join semantics: a null bound or null key never matches
        if (loV != null && hiV != null && !key.anyNull) {
          val k = key.copy()
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            grouped.put(k, buf)
          }
          buf += ((loToLong(loV), hiToLong(hiV), row))
        }
      }
      grouped.forEach { (key, buf) =>
        val sorted = buf.sortBy(_._1).toArray
        val los = sorted.map(_._1)
        val his = sorted.map(_._2)
        val rows = sorted.map(_._3)
        val prefixMaxHi = new Array[Long](his.length)
        var m = Long.MinValue
        var i = 0
        while (i < his.length) {
          if (his(i) > m) m = his(i)
          prefixMaxHi(i) = m
          i += 1
        }
        index.put(key, IntervalIndex(los, his, prefixMaxHi, rows))
      }

      // ---- probe ----
      val probeKeyProj = UnsafeProjection.create(
        lKeys.map(BindReferences.bindReference(_, leftOut)))
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow()
      val hiInc = hiInclusive
      probeIter.flatMap { probeRow =>
        val pV = boundPoint.eval(probeRow)
        val pKey = if (pV == null) null else probeKeyProj(probeRow)
        if (pV == null || pKey.anyNull) Iterator.empty
        else {
          val idx = index.get(pKey)
          if (idx == null) Iterator.empty
          else {
            val p = pointToLong(pV)
            // last interval with lo <= p
            var a = 0; var b = idx.los.length - 1; var last = -1
            while (a <= b) {
              val mid = (a + b) >>> 1
              if (idx.los(mid) <= p) { last = mid; a = mid + 1 } else b = mid - 1
            }
            val matches = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            var i = last
            // prefix-max(hi) can't contain p => nothing at or before i can
            while (i >= 0 &&
                (if (hiInc) idx.prefixMaxHi(i) >= p else idx.prefixMaxHi(i) > p)) {
              if (if (hiInc) idx.his(i) >= p else idx.his(i) > p)
                matches += idx.rows(i)
              i -= 1
            }
            // reverse so matches come out in ascending lo order
            matches.reverseIterator.map(r => resultProj(joined(probeRow, r)))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): PointInIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** lo-sorted intervals of one key group plus the prefix-max(hi) pruning
  * array; `rows` are the original build rows in the same order. */
final case class IntervalIndex(
    los: Array[Long], his: Array[Long], prefixMaxHi: Array[Long],
    rows: Array[InternalRow])
