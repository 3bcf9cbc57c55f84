package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global position index over a total order WITHOUT a single-partition
  * window.
  *
  * `row_number() OVER (ORDER BY ...)` funnels every row through ONE
  * task — the classic scale cliff for "give the corpus a global
  * training order" (deterministic shuffle, curriculum order, stable
  * export numbering). This operator keeps the work distributed:
  *
  *   1. `repartitionByRange` on the sort key: rows land in ordered,
  *      non-overlapping key ranges — the one full-data shuffle, the
  *      same one any global sort pays. `sortWithinPartitions` then
  *      orders each range locally (no data movement).
  *   2. A local 1-based rank per partition via a narrow
  *      `mapPartitions` counter (the genuinely imperative per-partition
  *      step; everything else stays declarative).
  *   3. Per-partition row counts — a partial-aggregated `groupBy` that
  *      moves ≤ numPartitions rows — turned into cumulative offsets by
  *      a window over that driver-scale table, broadcast-joined back.
  *
  * `pos = offset(partition) + local_rank` equals the single-partition
  * `row_number` for any TOTAL sort key, at any partition count.
  * RangePartitioner's bound sampling is deterministically seeded, and
  * correctness never depends on where the bounds fall — only on ranges
  * being ordered and disjoint, which `repartitionByRange` guarantees.
  */
object GlobalIndex {

  /** Adds `posCol` (1-based Long, dense, unique) ordering `df` by
    * `sortCols`, which MUST be a total order for the result to be
    * deterministic (append a unique id as the last key).
    */
  def withPosition(
      df: DataFrame,
      sortCols: Seq[Column],
      posCol: String,
      numPartitions: Int): DataFrame = {
    require(sortCols.nonEmpty, "GlobalIndex needs at least one sort column")
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_gi_pid", spark_partition_id())
    val schema = ranged.schema.add("_gi_rank", LongType, nullable = false)
    val ranked = ranged.mapPartitions { it =>
      var i = 0L
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }(Encoders.row(schema))
    // Partial aggregation reduces each partition to one row before this
    // shuffle; the cumulative window's single-partition exchange moves
    // ≤ numPartitions rows (driver-scale, like any global aggregate).
    // Counting from `ranged` (not `ranked`) keeps this branch columnar —
    // it reuses the range exchange without the row-object round-trip.
    val offsets = ranged
      .groupBy(col("_gi_pid"))
      .agg(count(lit(1)).as("_gi_n"))
      .withColumn(
        "_gi_off",
        coalesce(
          sum(col("_gi_n")).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("_gi_pid"))
              .rowsBetween(Long.MinValue, -1)),
          lit(0L)))
      .select(col("_gi_pid"), col("_gi_off"))
    ranked
      .join(broadcast(offsets), "_gi_pid")
      .withColumn(posCol, (col("_gi_off") + col("_gi_rank")).cast("long"))
      .drop("_gi_pid", "_gi_rank", "_gi_off")
  }

  /** Distributed prefix scan: adds `posCol` (1-based global rank) AND
    * `cumCol` (running total of `valueCol`, inclusive) over the total
    * order `sortCols` — the classic two-phase parallel prefix-sum.
    * Same shape as [[withPosition]]: one range shuffle, per-partition
    * local scans, a ≤-numPartitions-row offset table broadcast back.
    * `valueCol` must be a non-null LongType column (exact sums).
    */
  def withRunningTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      posCol: String,
      cumCol: String,
      numPartitions: Int): DataFrame =
    withRunningTotals(df, sortCols, Seq(valueCol), posCol, Seq(cumCol),
      numPartitions)

  /** [[withRunningTotal]] for SEVERAL value columns in ONE pass: all
    * running totals share the single range shuffle and per-partition
    * scan instead of paying one scan each and a join to reassemble
    * (the q61 calibration sweep needs cumulative tp AND
    * predicted-positive counts over the same margin order).
    * `valueCols(i)`'s inclusive running total lands in `cumCols(i)`.
    */
  def withRunningTotals(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCols: Seq[String],
      posCol: String,
      cumCols: Seq[String],
      numPartitions: Int): DataFrame = {
    require(sortCols.nonEmpty, "GlobalIndex needs at least one sort column")
    require(valueCols.nonEmpty && valueCols.size == cumCols.size,
      "valueCols and cumCols must pair up")
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_gi_pid", spark_partition_id())
    val vIdxs = valueCols.map(ranged.schema.fieldIndex)
    vIdxs.zip(valueCols).foreach { case (i, c) =>
      require(ranged.schema(i).dataType == LongType,
        s"withRunningTotals needs LongType for $c")
    }
    val schema = cumCols.indices
      .foldLeft(ranged.schema.add("_gi_rank", LongType, nullable = false)) {
        (s, i) => s.add(s"_gi_run_$i", LongType, nullable = false)
      }
    val ranked = ranged.mapPartitions { it =>
      var i = 0L
      val runs = Array.fill(vIdxs.size)(0L)
      it.map { r =>
        i += 1
        var j = 0
        while (j < runs.length) { runs(j) += r.getLong(vIdxs(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ (i +: runs.toSeq))
      }
    }(Encoders.row(schema))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("_gi_pid"))
      .rowsBetween(Long.MinValue, -1)
    val offsets0 = ranged
      .groupBy(col("_gi_pid"))
      .agg(count(lit(1)).as("_gi_n"),
        valueCols.zipWithIndex.map { case (c, i) =>
          sum(col(c)).as(s"_gi_s_$i")
        }: _*)
      .withColumn("_gi_off", coalesce(sum(col("_gi_n")).over(win), lit(0L)))
    val offsets = valueCols.indices
      .foldLeft(offsets0) { (d, i) =>
        d.withColumn(s"_gi_soff_$i",
          coalesce(sum(col(s"_gi_s_$i")).over(win), lit(0L)))
      }
      .select(col("_gi_pid") +: col("_gi_off") +:
        valueCols.indices.map(i => col(s"_gi_soff_$i")): _*)
    val joined = ranked
      .join(broadcast(offsets), "_gi_pid")
      .withColumn(posCol, (col("_gi_off") + col("_gi_rank")).cast("long"))
    val withCums = cumCols.zipWithIndex.foldLeft(joined) { case (d, (c, i)) =>
      d.withColumn(c,
        (col(s"_gi_soff_$i") + col(s"_gi_run_$i")).cast("long"))
    }
    withCums.drop(
      Seq("_gi_pid", "_gi_rank", "_gi_off") ++
        valueCols.indices.flatMap(i => Seq(s"_gi_run_$i", s"_gi_soff_$i")): _*)
  }
}
