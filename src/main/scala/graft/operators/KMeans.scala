package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Distributed Lloyd's k-means over an embedding column — the centroid
  * training job behind the IVF ANN index (see `LlmOps.ivfTopK`).
  *
  * Each iteration is two declarative passes, both linear in the data and
  * free of driver-side loops over rows:
  *
  *   1. assign: broadcast the (small) centroid table, cross-join, argmax
  *      cosine via a per-vector window — shuffle carries (id, k-row)
  *      nothing; the window partitions by the vector id.
  *   2. recompute: posexplode the assigned vectors to (cell, dim, x) and
  *      average per (cell, dim) — the shuffle carries partial (sum, count)
  *      buffers per (cell, dim), i.e. k×d rows after map-side combine,
  *      regardless of data size. Centroids reassemble via the
  *      sort-struct-array trick.
  *
  * At 100 TB: centroids stay broadcastable for any practical k·d; the
  * recompute shuffle is k×d per partition — constant; the assign pass is
  * the dominant cost at k comparisons per vector per iteration, the same
  * arithmetic any IVF trainer pays. Cells that lose all members drop out
  * (standard Lloyd's-with-drop; k can only shrink).
  *
  * Argmax ties break on the lower cell_id, so the trajectory is
  * deterministic up to floating-point summation order in avg().
  */
object KMeans {

  /** Refine `init` (cell_id, cv) for `iters` rounds over `data`.
    * Returns (cell_id, cv: array<double>).
    */
  def fit(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      init: DataFrame,
      iters: Int): DataFrame = {
    var cents = init.select(col("cell_id"),
      transform(col("cv"), _.cast("double")).as("cv"))
    var i = 0
    while (i < iters) {
      val assigned = assign(data, idCol, vecCol, cents)
      cents = assigned
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cell_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
      i += 1
    }
    cents
  }

  /** Nearest-centroid assignment: (cell_id, idCol, vecCol) per vector.
    *
    * Map-only (r17): the centroid table is a trained MODEL — capped at
    * model scale by every trainer here (LlmOps.ivfCentroids maxCells,
    * the MaxSim cell caps) — so it is collected once (the same
    * driver-scale collect ivfCentroids already does) and baked into
    * the plan as a [[graft.functions.NearestCellF]] argmax constant.
    * The previous form cross-joined the broadcast centroids and ranked
    * with a per-id row_number window, which repartitioned AND sorted
    * n·k rows per call — the dominant shuffle of every k-means
    * iteration and IVF build at any scale; now the assignment is one
    * codegen'd expression inside the corpus scan with NO exchange.
    * Selection semantics are the window's exactly (sim desc, NaN
    * first, nulls last, ties → lower cell_id; identical IEEE cosine) —
    * row-for-row parity with the retained [[assignViaWindow]] is
    * pinned in KMeansSpec for DENSE inputs.
    *
    * DOCUMENTED DIVERGENCE on null/null-element DATA vectors (r17
    * ADVICE; the same class PqEncodeF documents for its null-dist
    * case): when every cell's sim is null for a row, the window form
    * still emits the lowest cell_id (nulls-last + tiebreak) while the
    * kernel emits a NULL cell_id, so such rows drop out of any
    * downstream cell_id equi-join. Unreachable from the trainers here —
    * they assign the same vectors they trained on, and a trained
    * centroid table is avg()-derived (never null) — and the kernel's
    * NULL is the better serving behavior (a vectorless row has no
    * nearest cell). Pinned, not accidental: KMeansSpec's null-vector
    * fixture asserts exactly this divergence.
    */
  def assign(
      data: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val rows = cents.select(col("cell_id").cast("long"), col("cv")).collect()
    if (rows.isEmpty) {
      // the cross-join form yields an empty result on an empty centroid
      // table; preserve that degenerate contract
      return data.select(col(idCol).cast("long").as("cell_id"),
        col(idCol), col(vecCol)).limit(0)
    }
    val sorted = rows.sortBy(_.getLong(0))
    val cellIds = sorted.map(_.getLong(0))
    val cvs: Array[Array[Double]] = sorted.map { r =>
      val s = r.getSeq[Any](1)
      // a null ELEMENT makes the whole cell's sim null in the window
      // form (DotF null semantics) — encode as a null cv so the kernel
      // reproduces "never selected unless every sim is null"
      if (s == null || s.contains(null)) null
      else s.map {
        case f: Float => f.toDouble // exact widening — DotF does the same
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"KMeans.assign: centroid element of ${other.getClass}")
      }.toArray
    }
    data.select(col(idCol), col(vecCol))
      .select(
        graft.functions.NearestCellF(col(vecCol), cvs, cellIds).as("cell_id"),
        col(idCol), col(vecCol))
  }

  /** The original crossJoin(broadcast) + rank-window formulation of
    * [[assign]] — retained as the independently-derived reference the
    * NearestCellF kernel is spec'd against. Not on any query path.
    */
  private[graft] def assignViaWindow(
      data: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cell_id"))
    data.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .withColumn("__sim", VectorFns.cosine(col(vecCol), col("cv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cell_id"), col(idCol), col(vecCol))
  }

  /** Deterministic init: every `every`-th vector by id order. */
  def initEvery(data: DataFrame, idCol: String, vecCol: String, every: Int): DataFrame =
    data.filter(pmod(col(idCol), lit(every)) === 1)
      .select(col(idCol).cast("long").as("cell_id"), col(vecCol).as("cv"))
}
