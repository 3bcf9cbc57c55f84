package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for each left row, attach the most
  * recent right row with the same key whose time is <= the left time.
  *
  * Implementation is the scalable union-sort trick (SURVEY §2.2 "as-of
  * via window trick"): tag both sides, union, and run last_value(...)
  * IGNORE NULLS over a window partitioned by key and ordered by time —
  * one shuffle on (key), no range join, no per-row subquery. Right rows
  * sort before left rows at equal timestamps so "at or before" includes
  * simultaneous right rows.
  *
  * At 100 TB this is the join you want: cost is a single hash shuffle of
  * left+right on the key plus a per-partition sort, versus a nested-loop
  * or per-key scan for the naive formulation.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTime   event-time column name on the left
    * @param rightTime  event-time column name on the right
    * @param rightVals  right columns to carry (renamed as given)
    * @param inclusive  true (default): attach right rows with time <=
    *                   left time. false: strictly earlier only (<) —
    *                   the leakage-safe mode for training-feature
    *                   retrieval, where a feature version stamped at
    *                   exactly the label's time must NOT be visible.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[(String, String)],
      inclusive: Boolean = true): DataFrame = {

    // Tie order at equal _t decides <= vs <: the running last_value only
    // sees rows sorted BEFORE the probe row, so inclusive puts right
    // rows first (0 < 1) and strict puts them after (2 > 1).
    val rightSide = if (inclusive) 0 else 2

    val leftTagged = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumns(rightVals.map { case (_, out) => out -> lit(null) }.toMap)

    val rightTagged = right
      .select(
        (Seq(
          col(rightKey).as("_k"),
          col(rightTime).as("_t"),
          lit(rightSide).as("_side")) ++
          rightVals.map { case (in, out) => col(in).as(out) }): _*)

    // align schemas: right side lacks the left payload columns
    val leftCols = leftTagged.columns
    val rightAligned = leftCols.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(leftCols.map(col): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightVals.foldLeft(leftTagged.unionByName(rightAligned)) {
      case (df, (_, out)) =>
        df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }

    filled
      .filter(col("_side") === 1)
      .drop("_k", "_t", "_side")
  }
}
