package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional file skipping.
  *
  * `interleave` maps two non-negative integer keys to their bit-interleaved
  * Morton code; writing a table range-partitioned and sorted by that code
  * clusters rows so that EVERY participating column has narrow min/max
  * ranges per file. Parquet keeps per-row-group min/max stats for all
  * columns, so a predicate on EITHER dimension (or both) skips most
  * row groups — unlike a single-column sort, which only skips on the
  * leading column. This is the standard lakehouse layout technique for
  * multi-dimensional scans over very large fact tables (one extra shuffle
  * at write time buys scan-time pruning on every dimension forever).
  *
  * The interleave is a pure column expression (shifts/masks), so it stays
  * inside whole-stage codegen; no UDF.
  */
object ZOrder {

  /** Morton code of two keys, `bits` bits each (result uses 2*bits bits).
    * Keys are clamped to [0, 2^bits) by masking; callers should pre-scale
    * values into that range (quantization only affects clustering
    * granularity, never correctness of downstream queries).
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val am = a.cast("long").bitwiseAND((1L << bits) - 1)
    val bm = b.cast("long").bitwiseAND((1L << bits) - 1)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val abit = shiftleft(shiftright(am, i).bitwiseAND(1L), 2 * i + 1)
      val bbit = shiftleft(shiftright(bm, i).bitwiseAND(1L), 2 * i)
      acc.bitwiseOR(abit).bitwiseOR(bbit)
    }
  }

  /** Rewrite `df` into `numFiles` z-clustered files on (a, b): range
    * partition by the Morton code, sort within partitions, drop the
    * helper column. The caller writes the result; all data movement is
    * one shuffle regardless of table size.
    */
  def cluster(df: DataFrame, a: Column, b: Column,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val z = interleave(a, b, bits)
    df.withColumn("__zval", z)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
  }
}
