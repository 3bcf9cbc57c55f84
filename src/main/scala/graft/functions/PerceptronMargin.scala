package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native serving kernel for the q61 perceptron margin.
  *
  * The declarative form — `aggregate(split(text,' '), bias, (acc, w) ->
  * acc + wmap[md5bucket(w)])` — is a higher-order function, and HOFs
  * evaluate their lambdas INTERPRETED (`ArrayAggregate` is
  * CodegenFallback): one boxed call per token plus a per-token
  * md5/conv/substring expression tree. Same trap the repo already
  * measured on the vector folds (VectorKernels scaladoc). This kernel
  * computes the identical margin in one tight byte-level loop behind a
  * static call, so the scoring projection stays in whole-stage codegen
  * — the shape that gates a 100 TB scan or an ingestion stream.
  *
  * Exactness contract (what lets it face the same DuckDB oracle, pinned
  * in PerceptronSpec against the HOF formulation): tokens are the
  * single-space split of the text WITH empty segments kept (Spark's
  * `split(text, " ")` has limit -1 — `"a  b "` yields `""` tokens — and
  * 0x20 never occurs inside a multi-byte UTF-8 sequence, so splitting
  * bytes equals splitting the string); a token's bucket is its md5
  * digest's first byte mod `buckets` (== `conv(substring(md5(w),1,2),
  * 16,10) % buckets`); margin = bias + Σ weight(bucket) in exact Long
  * arithmetic (commutative — order cannot matter).
  */
object PerceptronMarginKernel {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `w`: weights for buckets `0 .. w.length-2`, bias at `w.length-1`. */
  def margin(text: UTF8String, w: Array[Long]): Long = {
    val bytes = text.getBytes
    val buckets = w.length - 1
    var acc = w(buckets) // bias
    val md = mdLocal.get()
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val digest = md.digest()
        acc += w((digest(0) & 0xff) % buckets)
        start = i + 1
      }
      i += 1
    }
    acc
  }
}

/** Per-row perceptron margin over a text column with the model baked in
  * as a plan constant (buckets+1 longs — plan metadata, not a join).
  */
case class PerceptronMarginF(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.length >= 2,
    s"weights must hold >=1 bucket plus the bias, got ${weights.length}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"PerceptronMarginF expects a string column, got $other")
  }

  override protected def nullSafeEval(text: Any): Any =
    PerceptronMarginKernel.margin(text.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("perceptronWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.PerceptronMarginKernel.margin($t, $wRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PerceptronMarginF =
    copy(child = newChild)

  // Array[Long] has reference equality; make the expression compare by
  // content so plan transforms (e.g. deduplication) behave.
  override def equals(other: Any): Boolean = other match {
    case PerceptronMarginF(c, ws) =>
      c == child && java.util.Arrays.equals(ws, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)
}

object PerceptronMarginF {
  /** `w`: bucket -> weight map including the bias at
    * [[graft.operators.Perceptron.BiasBucket]]; `buckets` contiguous
    * from 0.
    */
  def apply(text: Column, w: Map[Long, Long]): Column = {
    val buckets = w.keys.max.toInt + 1
    val arr = Array.tabulate(buckets + 1) { i =>
      if (i == buckets) w(-1L) else w.getOrElse(i.toLong, 0L)
    }
    GraftColumnBridge.column(
      PerceptronMarginF(GraftColumnBridge.expression(text), arr))
  }
}
