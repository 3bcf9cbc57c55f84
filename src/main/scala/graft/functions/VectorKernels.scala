package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd kernels for the vector hot loops.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate
  * their lambdas INTERPRETED — one boxed functional call per element —
  * the same trap measured at 365 s for the k=128 MinHash chain
  * (see [[MinHashSignature]]). These expressions compute the identical
  * in-order double folds in one tight loop behind a static call, so the
  * surrounding projection stays in whole-stage codegen and per-element
  * cost is a fused multiply-add.
  *
  * Bit-exactness contract (what lets [[VectorFns]] swap these in without
  * touching any oracle): elements are widened float→double BEFORE
  * multiplying and accumulated left-to-right in index order with a
  * double accumulator — the exact IEEE evaluation order of the previous
  * `aggregate(zip_with(...))` formulation and of the DuckDB oracle's
  * in-order `unnest`+`sum`. Null element / length-mismatch semantics
  * also match `zip_with` + `aggregate`: any participating null (or a
  * ragged pair) yields null.
  */
object VectorKernels {

  private[functions] def elemKind(dt: DataType, side: String): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$side of a vector kernel must be array<float|double>, got $other")
  }

  /** In-order Σ a_i*b_i; null on ragged/null-element input (boxed). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** In-order Σ lut[codes_j] — the asymmetric-distance (ADC) scoring
    * fold of a product-quantized vector: `codes` holds GLOBAL dense
    * codebook ids (sub-space offsets pre-added by the encoder), `lut`
    * the per-centroid partial distances for one query. Null on null
    * input/element; null (not an error) on an out-of-range code so a
    * stale codes table degrades visibly rather than crashing the scan.
    */
  def lutSum(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    val ln = lut.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i)) return null
      val c = codes.getLong(i)
      if (c < 0L || c >= ln) return null
      if (lut.isNullAt(c.toInt)) return null
      acc += lut.getDouble(c.toInt)
      i += 1
    }
    acc
  }

  /** Build one full ADC lookup table from a query residual in a single
    * native loop (the batch-serve LUT kernel behind [[LutBuildF]]):
    * for global code i with subspace `subIds(i)` and centroid `cvs(i)`
    * (length sl), lut(i) = ‖qr[sub·sl … sub·sl+sl) − cv‖², computed as
    * the SAME three in-order folds and combine order as the
    * DotF-composed formulation it replaces (Σx², Σxc, Σc², then
    * nq − 2·dc + nc) — bit-identical values, one codegen'd call
    * instead of m·ksub interpreted lambda evaluations. Null on ragged
    * or null-element input, mirroring the HOF semantics.
    */
  def lutBuild(qr: ArrayData, subIds: ArrayData, cvs: ArrayData): ArrayData = {
    val n = cvs.numElements()
    if (subIds.numElements() != n) return null
    val d = qr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (subIds.isNullAt(i) || cvs.isNullAt(i)) return null
      val cv = cvs.getArray(i)
      val sl = cv.numElements()
      val start = subIds.getInt(i) * sl
      if (start < 0 || start + sl > d) return null
      var nq = 0.0
      var dc = 0.0
      var nc = 0.0
      var j = 0
      while (j < sl) {
        if (qr.isNullAt(start + j) || cv.isNullAt(j)) return null
        val x = qr.getDouble(start + j)
        val c = cv.getDouble(j)
        nq += x * x
        dc += x * c
        nc += c * c
        j += 1
      }
      out(i) = nq - 2.0 * dc + nc
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Sign-bit LSH bucket: bit j of the result is the sign of projection
    * j, where hyperplane j's component i is ±1 from
    * `pmod(xxhash64(i + (j << 16)), 2)` — the identical projection the
    * HOF formulation computes (seed 42, the `xxhash64` SQL default),
    * evaluated per-j in index order. One pass over the vector, lanes in
    * a local accumulator array.
    */
  def signBits(v: ArrayData, nBits: Int, vFloat: Boolean): java.lang.Long = {
    val n = v.numElements()
    val acc = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var j = 0
      while (j < nBits) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(i.toLong + (j.toLong << 16), 42L)
        val s = if ((h & 1L) == 0L) 1.0 else -1.0
        acc(j) += x * s
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (acc(j) >= 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** `Σ a_i * b_i` with the fold order of `aggregate(zip_with(a,b,*))`. */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val aFloat = VectorKernels.elemKind(left.dataType, "left")
  private lazy val bFloat = VectorKernels.elemKind(right.dataType, "right")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.VectorKernels.dot($a, $b, $aFloat, $bFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

/** Packed sign bits of `nBits` deterministic hash-hyperplane projections. */
case class SignBitsLsh(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val vFloat = VectorKernels.elemKind(child.dataType, "input")

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.signBits(v.asInstanceOf[ArrayData], nBits, vFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val boxed = ctx.freshName("sigBoxed")
      s"""
         |java.lang.Long $boxed =
         |  graft.functions.VectorKernels.signBits($v, $nBits, $vFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBitsLsh =
    copy(child = newChild)
}

object DotF {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotF(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** `Σ lut[codes_j]` — codegen'd ADC scoring over PQ code arrays. Left:
  * `array<bigint>` global code ids; right: `array<double>` lookup table
  * (typically a broadcast literal built from one query vector). Keeps
  * PQ search a pure map over the codes scan — no join, no shuffle.
  */
case class LutSumF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"LutSumF expects (array<bigint>, array<double>), got ($l, $r)")
    }
  }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    VectorKernels.lutSum(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val boxed = ctx.freshName("lutBoxed")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorKernels.lutSum($c, $l);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LutSumF =
    copy(left = newLeft, right = newRight)
}

object LutSumF {
  def apply(codes: Column, lut: Column): Column =
    GraftColumnBridge.column(LutSumF(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(lut)))
}

/** Full ADC LUT from one query residual — `array<double>` of length
  * ksub·m. Children: the residual (`array<double>`), the per-code
  * subspace ids (`array<int>`, typically a codebook literal), and the
  * per-code centroids (`array<array<double>>`, same literal source).
  * See [[VectorKernels.lutBuild]] for arithmetic and null semantics.
  */
case class LutBuildF(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(org.apache.spark.sql.types.IntegerType, _),
          ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"LutBuildF expects (array<double>, array<int>, " +
            s"array<array<double>>), got ($a, $b, $c)")
    }
  }

  override protected def nullSafeEval(qr: Any, subs: Any, cvs: Any): Any =
    VectorKernels.lutBuild(qr.asInstanceOf[ArrayData],
      subs.asInstanceOf[ArrayData], cvs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, s, c) => {
      val res = ctx.freshName("lutBuilt")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.VectorKernels.lutBuild($q, $s, $c);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LutBuildF =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LutBuildF {
  def apply(qr: Column, subs: Column, cvs: Column): Column =
    GraftColumnBridge.column(LutBuildF(
      GraftColumnBridge.expression(qr), GraftColumnBridge.expression(subs),
      GraftColumnBridge.expression(cvs)))
}
