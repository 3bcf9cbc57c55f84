package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrain trigger for frozen-model ANN indexes (q68/q69/q75).
  *
  * Incremental maintenance encodes every appended batch against FROZEN
  * coarse centroids; the 100 TB question is when freezing breaks. The
  * failure mode is distributional: a batch drawn from a region the
  * centroids don't cover piles into few cells, candidate lists go
  * imbalanced, and probe recall decays (measured by
  * `graft.tools.RecallRehearsal`). The trigger is therefore the classic
  * population-stability statistic over the index's OWN structure: compare
  * the batch's cell-occupancy distribution against the base corpus's,
  * PSI = Σ_cells (p_batch − p_base) · ln(p_batch / p_base), Laplace
  * smoothing so empty cells stay finite.
  *
  * A fit-style statistic (mean cosine gap to the nearest centroid) was
  * rehearsed first and rejected: on near-isotropic embeddings every
  * transform lands within ±15% of the in-distribution gap, while
  * cell-occupancy PSI separates an in-distribution batch (~0.2, sampling
  * noise of n≈50 over K≈13 cells) from a shifted batch (~2.9) by an
  * order of magnitude. The default threshold 0.75 sits midway between
  * those in log space; at real batch sizes the in-distribution null
  * shrinks as K/n, so 0.75 is conservative at scale.
  *
  * Cost shape: one broadcast-assign per side (map-side O(n·K), no
  * shuffle) plus a K-row aggregate — O(batch) like the append itself, so
  * the trigger can run on EVERY append. At 100 TB the base occupancy is
  * computed once at build time and persisted beside the centroids; only
  * the batch side is assigned per append.
  */
object IndexDrift {

  /** (cell_id, n): how many of `data`'s vectors assign to each frozen
    * cell. Cells nobody assigns to are absent (the PSI join restores
    * them against the centroid grid).
    */
  def cellOccupancy(
      data: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame): DataFrame =
    KMeans.assign(data, idCol, vecCol, coarse)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))

  /** One row (n_base, n_batch, psi): population-stability index of the
    * batch's cell occupancy against the base corpus's, over the full
    * centroid grid with add-one smoothing.
    */
  def occupancyPsi(
      base: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame): DataFrame =
    occupancyPsiFromBase(
      cellOccupancy(base, idCol, vecCol, coarse), batch, idCol, vecCol,
      coarse)

  /** (cell_id, n) straight from an ALREADY-ENCODED codes table (gen
    * rows carry their assigned cell_id) — the streaming-append form:
    * the stored index IS the assignment, so per-trigger drift costs one
    * count over the generation just written, no vector touched.
    */
  def occupancyOfCodes(codes: DataFrame): DataFrame =
    codes.groupBy(col("cell_id")).agg(count(lit(1)).as("n"))

  /** [[occupancyPsi]] with the base occupancy PRECOMPUTED — the form an
    * append pipeline actually uses (base occupancy persisted beside the
    * centroids at build time; only the batch side assigned per append),
    * and what lets a caller triggering on several batches (q76: in-dist
    * AND drifted) pay the O(base · K) assign once.
    */
  def occupancyPsiFromBase(
      baseOcc: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame): DataFrame =
    occupancyPsiFromOccupancies(baseOcc,
      cellOccupancy(batch, idCol, vecCol, coarse), coarse)

  /** PSI from two precomputed (cell_id, n) occupancies over the
    * centroid grid — the core every other form delegates to.
    */
  def occupancyPsiFromOccupancies(
      baseOcc: DataFrame, batchOcc: DataFrame,
      coarse: DataFrame): DataFrame = {
    val grid = coarse.select(col("cell_id"))
    val b = baseOcc.withColumnRenamed("n", "nb")
    val a = batchOcc.withColumnRenamed("n", "na")
    // model-scale everywhere below: grid is the centroid table (≤256
    // rows by ivfCentroids' cap), totals are 1-row aggregates
    // coalesce: an empty side must mean n=0 (uniform smoothed
    // distribution), not a null that silently nulls the whole statistic
    val tot = b.agg(coalesce(sum(col("nb")), lit(0L)).as("n_base"))
      .crossJoin(a.agg(coalesce(sum(col("na")), lit(0L)).as("n_batch")))
      .crossJoin(grid.agg(count(lit(1)).as("k_cells")))
    // ungrouped final aggregate → provably ONE row (the registry-wide
    // nested-loop guard needs this bound for q76's crossJoins; a
    // groupBy on the derived totals reads as unbounded to it); n_base /
    // n_batch are constant across the grid, so max() recovers them
    grid.join(b, Seq("cell_id"), "left").join(a, Seq("cell_id"), "left")
      .crossJoin(broadcast(tot))
      .select(col("n_base"), col("n_batch"),
        ((coalesce(col("na"), lit(0L)) + 1.0) /
          (col("n_batch") + col("k_cells"))).as("pa"),
        ((coalesce(col("nb"), lit(0L)) + 1.0) /
          (col("n_base") + col("k_cells"))).as("pb"))
      .agg(max(col("n_base")).as("n_base"),
        max(col("n_batch")).as("n_batch"),
        sum((col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .as("psi"))
  }

  /** One row (n_base, n_batch, psi, retrain_needed): the append-time
    * contract — encode the batch against the frozen models as usual, but
    * when `psi > threshold` the caller must schedule a retrain (new
    * centroid/codebook generation) instead of trusting frozen recall.
    */
  def retrainTrigger(
      base: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame, threshold: Double = 0.75): DataFrame =
    retrainTriggerFromBase(
      cellOccupancy(base, idCol, vecCol, coarse), batch, idCol, vecCol,
      coarse, threshold)

  /** [[retrainTrigger]] over a precomputed base occupancy. */
  def retrainTriggerFromBase(
      baseOcc: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame, threshold: Double = 0.75): DataFrame =
    occupancyPsiFromBase(baseOcc, batch, idCol, vecCol, coarse)
      .select(col("n_base"), col("n_batch"), col("psi"),
        (col("psi") > threshold).as("retrain_needed"))

  /** The deliberate-drift transform the trigger, its spec, and the
    * recall rehearsal all calibrate against — defined ONCE so the
    * threshold, the q76 oracle, and the published rehearsal numbers
    * cannot silently diverge.
    */
  def shifted(df: DataFrame, idCol: String, vecCol: String,
      delta: Float = 0.5f): DataFrame =
    df.select(col(idCol),
      transform(col(vecCol), x => (x + lit(delta)).cast("float"))
        .as(vecCol))
}
