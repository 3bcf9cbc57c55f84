package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the
  * native codegen'd kernels in [[VectorKernels]] ([[DotF]] /
  * [[SignBitsLsh]]). The original `aggregate(zip_with(...))`
  * formulation evaluated its lambdas INTERPRETED — one boxed call per
  * element — the same trap measured at 365 s on the MinHash chain; the
  * kernels run the identical fold as one codegen'd loop.
  *
  * Determinism: folds run in index order with a DOUBLE accumulator, and
  * elements are cast float→double BEFORE multiplying, so results are
  * bit-identical to the previous HOF formulation (VectorKernelsSpec
  * asserts this) and to any engine doing an in-order double fold (the
  * DuckDB oracle's unnest+sum does exactly that).
  */
object VectorFns {

  /** Σ a_i * b_i as an in-order double fold. */
  def dot(a: Column, b: Column): Column = DotF(a, b)

  /** Σ a_i² (squared L2 norm). */
  def normSq(a: Column): Column = DotF(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Random-hyperplane LSH bucket: sign bits of `nBits` pseudo-random
    * projections packed into a long. Hyperplane h_j has components
    * derived from a hash of (j, i) — deterministic, no stored model, and
    * computable identically on any node. Used to prune candidate pairs
    * for approximate NN search: near vectors (cosine) agree on most sign
    * bits, so banding the bits gives high-recall buckets.
    */
  def signBits(v: Column, nBits: Int): Column =
    GraftColumnBridge.column(
      SignBitsLsh(GraftColumnBridge.expression(v), nBits))
}
