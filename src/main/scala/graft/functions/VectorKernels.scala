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

  /** Centered SQ8 quantize + deterministic ±1 JL projection in one pass
    * — the map-only form of the explode→broadcast-join→(vec_id, j)
    * aggregate pipeline in `Sampling.jlReducedVectors` (which shuffled
    * n·k partial rows and re-ran the whole subtree per consumer). For
    * each output dim j: r_j = Σ_i c_i·sgn(i, j), where
    * c_i = clamp₀²⁵⁵⌊(v_i − mn_i)·255/(mx_i − mn_i)⌋ − 128 (a
    * zero-span dim yields c_i = 0 − 128 = −128, matching
    * `when(mx = mn, 0L).otherwise(clamp) − 128L`) and sgn is the
    * md5-derived sign matrix.
    *
    * Bit-exactness contract with the SQL formulation it replaces (and
    * the DuckDB oracle): the code is
    * `when(mx = mn, 0L).otherwise(greatest(0, least(255,
    * floor((v − mn)·255.0/(mx − mn)) as long)) − 128L` — evaluated
    * here in the same IEEE double order: diff = v − mn (v widened
    * float→double first), scaled = diff · 255.0, q = scaled / span,
    * floor, long-clamp, − 128. The per-j accumulation is a LONG sum of
    * exact products (|c| ≤ 128, d ≤ 2^45), so any summation order is
    * exact; index order is used. Output is array<double> of integer
    * values, exactly `cast(r as double)`.
    *
    * Null/ragged semantics: null vector → null (nullSafeEval); a null
    * element or a vector longer than the model → null (loud, visible
    * degradation — the pipeline's data is fixed-width).
    */
  def jlProject(v: ArrayData, mn: Array[Double], mx: Array[Double],
      signs: Array[Byte], k: Int, vFloat: Boolean): ArrayData = {
    val n = v.numElements()
    if (n > mn.length) return null
    val acc = new Array[Long](k)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val lo = mn(i)
      val hi = mx(i)
      val c: Long =
        if (hi == lo) 0L - 128L
        else {
          val q = math.floor((x - lo) * 255.0 / (hi - lo))
          // floor(double) cast to long, then clamp at long — the exact
          // greatest(0, least(255, cast(floor(..) as long))) order.
          // NaN casts to 0L like Spark's double→long cast.
          val ql = if (q.isNaN) 0L else if (q > Long.MaxValue) Long.MaxValue
            else if (q < Long.MinValue) Long.MinValue else q.toLong
          math.max(0L, math.min(255L, ql)) - 128L
        }
      var j = 0
      val base = i * k
      while (j < k) {
        acc(j) += c * signs(base + j)
        j += 1
      }
      i += 1
    }
    val out = new Array[Double](k)
    var j = 0
    while (j < k) { out(j) = acc(j).toDouble; j += 1 }
    ArrayData.toArrayData(out)
  }

  /** Nearest-centroid argmax — the map-only form of KMeans.assign's
    * crossJoin(broadcast(cents)) + per-id rank window (which shuffled
    * and sorted n·k rows per call). Per cell c (iterated in ascending
    * cell_id order): sim_c = dot(v, cv_c) / (sqrt(normSq v) ·
    * sqrtNc(c)), with dot/normSq the exact in-order DotF folds and
    * sqrtNc precomputed per cell (sqrt of the same normSq value the
    * SQL form recomputed per row — identical bits). Selection
    * replicates `row_number over (order by sim desc, cell_id)`: a
    * candidate replaces the incumbent only on Double.compare > 0
    * (NaN > any non-NaN, ties keep the earlier = lower cell_id), and
    * a null sim (ragged cv) never replaces — nulls-last. Null vector
    * → null (nullSafeEval).
    */
  def nearestCell(v: ArrayData, cents: Array[Array[Double]],
      cellIds: Array[Long], sqrtNc: Array[Double], vFloat: Boolean): java.lang.Long = {
    val n = v.numElements()
    var nv = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      nv += x * x
      i += 1
    }
    val sv = math.sqrt(nv)
    var best = cellIds(0)
    var bestSim: java.lang.Double = cellSim(v, cents(0), sv * sqrtNc(0), vFloat)
    var c = 1
    while (c < cents.length) {
      val s = cellSim(v, cents(c), sv * sqrtNc(c), vFloat)
      if (s != null && (bestSim == null ||
          java.lang.Double.compare(s.doubleValue(), bestSim.doubleValue()) > 0)) {
        best = cellIds(c)
        bestSim = s
      }
      c += 1
    }
    best
  }

  private def cellSim(v: ArrayData, cv: Array[Double], denom: Double,
      vFloat: Boolean): java.lang.Double = {
    if (cv == null) return null // null-element centroid — DotF yields null
    val n = v.numElements()
    if (cv.length != n) return null // ragged pair — DotF yields null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * cv(i)
      i += 1
    }
    acc / denom
  }

  /** One-pass PQ encode — the map-only form of ProductQuantizer's
    * subvectors-explode → broadcast-join books → per-(id, sub) rank
    * window → collect_list reassembly (which shuffled n·m·ksub rows
    * and regrouped n·m rows per encode call). For subspace s with
    * subvector sv = v[s·subLen … (s+1)·subLen) (elements widened
    * float→double): dist(code) = (normSq(sv) − 2.0·dot(sv, cv)) +
    * normSq(cv) — the exact DotF in-order folds and combine order of
    * the SQL form, with normSq(cv) precomputed per code (same value
    * the SQL form recomputed per row, bit-identical). Selection
    * replicates `row_number over (order by __d asc, code asc)`:
    * Double.compare < 0 replaces, NaN sorts last, ties keep the lower
    * code (codes iterated ascending). One DELIBERATE divergence: a
    * null dist (ragged or null-element cv) is never selected here,
    * while ASC null ordering ranks nulls FIRST in the window form —
    * unreachable with trained codebooks (avg() never emits null
    * elements, lengths are subLen by construction), and preferring a
    * real distance over a broken codebook row is the defensible
    * semantics; parity is pinned against real books in the spec.
    * Output: the selected GLOBAL code per subspace in
    * sub_id order. Null vector → null; a vector shorter than m·subLen
    * per the caller's geometry contract yields what slice semantics
    * gave: subLen is derived from the actual vector length (d/m,
    * remainder dropped).
    */
  def pqEncode(v: ArrayData, m: Int, subCodes: Array[Array[Long]],
      subCvs: Array[Array[Array[Double]]], subNorms: Array[Array[Double]],
      vFloat: Boolean): ArrayData = {
    val d = v.numElements()
    val subLen = d / m
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val start = s * subLen
      // normSq(sv): in-order fold; null element → whole row degrades
      // like the SQL form's null dist (here: loud null result)
      var nsv = 0.0
      var i = 0
      while (i < subLen) {
        if (v.isNullAt(start + i)) return null
        val x = if (vFloat) v.getFloat(start + i).toDouble else v.getDouble(start + i)
        nsv += x * x
        i += 1
      }
      val codes = subCodes(s)
      val cvs = subCvs(s)
      val norms = subNorms(s)
      if (codes.length == 0) return null // no codebook rows for this sub
      var best = codes(0)
      var bestD: java.lang.Double = null
      var c = 0
      while (c < codes.length) {
        val cv = cvs(c)
        var dNew: java.lang.Double = null
        if (cv != null && cv.length == subLen) {
          var dot = 0.0
          var j = 0
          while (j < subLen) {
            val x = if (vFloat) v.getFloat(start + j).toDouble
              else v.getDouble(start + j)
            dot += x * cv(j)
            j += 1
          }
          dNew = (nsv - 2.0 * dot) + norms(c)
        }
        if (dNew != null && (bestD == null ||
            java.lang.Double.compare(dNew.doubleValue(), bestD.doubleValue()) < 0)) {
          best = codes(c)
          bestD = dNew
        }
        c += 1
      }
      out(s) = best
      s += 1
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

/** One-pass PQ encode of a vector against plan-constant per-subspace
  * codebooks (see [[VectorKernels.pqEncode]]): array<bigint> of m
  * global code ids in sub_id order. `subCodes(s)`/`subCvs(s)`/
  * `subNorms(s)` are that subspace's code ids (ascending), centroids
  * and precomputed normSq values.
  */
case class PqEncodeF(child: Expression, m: Int, subCodes: Array[Array[Long]],
    subCvs: Array[Array[Array[Double]]], subNorms: Array[Array[Double]])
    extends UnaryExpression {
  require(m >= 1 && subCodes.length == m && subCvs.length == m &&
    subNorms.length == m, "PqEncodeF: inconsistent codebook model")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val vFloat = VectorKernels.elemKind(child.dataType, "input")

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], m, subCodes, subCvs,
      subNorms, vFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodes", subCodes, "long[][]")
    val vRef = ctx.addReferenceObj("pqCvs", subCvs, "double[][][]")
    val nRef = ctx.addReferenceObj("pqNorms", subNorms, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("pqCodesOut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.VectorKernels.pqEncode($v, $m, $cRef, $vRef, $nRef, $vFloat);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeF =
    copy(child = newChild)
}

object PqEncodeF {
  /** Build from collected books rows (sub_id, code, cv) — cv widened
    * to double exactly as DotF widens floats.
    */
  def apply(v: Column, m: Int,
      books: Array[(Int, Long, Array[Double])]): Column = {
    val bySub = books.groupBy(_._1)
    val subCodes = new Array[Array[Long]](m)
    val subCvs = new Array[Array[Array[Double]]](m)
    val subNorms = new Array[Array[Double]](m)
    (0 until m).foreach { s =>
      val rows = bySub.getOrElse(s, Array.empty).sortBy(_._2)
      subCodes(s) = rows.map(_._2)
      subCvs(s) = rows.map(_._3)
      subNorms(s) = rows.map { r =>
        if (r._3 == null) Double.NaN // null-element cv: never selected
        else {
          var acc = 0.0
          var i = 0
          while (i < r._3.length) { acc += r._3(i) * r._3(i); i += 1 }
          acc
        }
      }
    }
    GraftColumnBridge.column(PqEncodeF(
      GraftColumnBridge.expression(v), m, subCodes, subCvs, subNorms))
  }
}

/** Nearest-centroid cell id for a vector against a plan-constant
  * centroid table (see [[VectorKernels.nearestCell]]). `cents` is the
  * per-cell centroid matrix, `cellIds` the matching cell ids (ascending),
  * `sqrtNc` the precomputed sqrt(normSq(cv)) per cell.
  */
case class NearestCellF(child: Expression, cents: Array[Array[Double]],
    cellIds: Array[Long], sqrtNc: Array[Double]) extends UnaryExpression {
  require(cents.nonEmpty && cents.length == cellIds.length &&
    cents.length == sqrtNc.length, "NearestCellF: inconsistent centroid model")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val vFloat = VectorKernels.elemKind(child.dataType, "input")

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCell(v.asInstanceOf[ArrayData], cents, cellIds, sqrtNc, vFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ncCents", cents, "double[][]")
    val idRef = ctx.addReferenceObj("ncIds", cellIds, "long[]")
    val nRef = ctx.addReferenceObj("ncNorms", sqrtNc, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val boxed = ctx.freshName("ncBoxed")
      s"""
         |java.lang.Long $boxed = graft.functions.VectorKernels.nearestCell(
         |  $v, $cRef, $idRef, $nRef, $vFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellF =
    copy(child = newChild)
}

object NearestCellF {
  def apply(v: Column, cents: Array[Array[Double]], cellIds: Array[Long]): Column = {
    val sqrtNc = cents.map { cv =>
      if (cv == null) Double.NaN // null-element cell: sim is null anyway
      else {
        var acc = 0.0
        var i = 0
        while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
        math.sqrt(acc)
      }
    }
    GraftColumnBridge.column(NearestCellF(
      GraftColumnBridge.expression(v), cents, cellIds, sqrtNc))
  }
}

/** One-pass SQ8-quantize + ±1 JL projection of a vector (see
  * [[VectorKernels.jlProject]]). The per-dim [mn, mx] model and the
  * d×k sign matrix are plan constants (driver-derived: the model from
  * one narrow aggregate, the signs from data-independent md5), so the
  * projection is a pure map over the corpus scan — no explode, no
  * broadcast join, no (vec_id, j) shuffle. `signs` is row-major
  * (dim-i-major) ±1 bytes.
  */
case class JlProjectF(child: Expression, mn: Array[Double], mx: Array[Double],
    signs: Array[Byte], k: Int) extends UnaryExpression {
  require(mn.length == mx.length, "JlProjectF: model length mismatch")
  require(signs.length == mn.length * k, "JlProjectF: sign matrix size mismatch")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val vFloat = VectorKernels.elemKind(child.dataType, "input")

  // literals for codegen: referenced objects, serialized with the plan
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.jlProject(v.asInstanceOf[ArrayData], mn, mx, signs, k, vFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("jlMn", mn, "double[]")
    val mxRef = ctx.addReferenceObj("jlMx", mx, "double[]")
    val sgRef = ctx.addReferenceObj("jlSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("jlRed")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.VectorKernels.jlProject($v, $mnRef, $mxRef, $sgRef, $k, $vFloat);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectF =
    copy(child = newChild)
}

object JlProjectF {
  def apply(v: Column, mn: Array[Double], mx: Array[Double],
      signs: Array[Byte], k: Int): Column =
    GraftColumnBridge.column(JlProjectF(
      GraftColumnBridge.expression(v), mn, mx, signs, k))
}
