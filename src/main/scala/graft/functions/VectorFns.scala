package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions (zip_with / aggregate) so everything stays inside
  * whole-stage codegen — no UDF serialization on the hot path.
  *
  * Determinism: folds run in index order with a DOUBLE accumulator, and
  * elements are cast float→double BEFORE multiplying, so results are
  * bit-identical to any engine doing an in-order double fold (the DuckDB
  * oracle's unnest+sum does exactly that).
  */
object VectorFns {

  /** Σ a_i * b_i as an in-order double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ a_i² (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Random-hyperplane LSH bucket: sign bits of `nBits` pseudo-random
    * projections packed into a long. Hyperplane h_j has components
    * derived from a hash of (j, i) — deterministic, no stored model, and
    * computable identically on any node. Used to prune candidate pairs
    * for approximate NN search: near vectors (cosine) agree on most sign
    * bits, so banding the bits gives high-recall buckets.
    */
  def signBits(v: Column, nBits: Int): Column = {
    // component i of hyperplane j: hash((j << 16) | i) mapped to ±1
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast("double") *
            (when(pmod(xxhash64(i.cast("long") + lit(j.toLong << 16)), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0)))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
