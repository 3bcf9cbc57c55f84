package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quota selection — "keep the `quota(group)` first rows of
  * each group under a deterministic hash order" — WITHOUT sorting whole
  * groups.
  *
  * The naive formulation (`row_number() OVER (PARTITION BY group ORDER
  * BY hash)` then `rn <= quota`) shuffles the corpus on the group key
  * and sorts each group in ONE task — a cliff when one group dominates
  * (every real corpus: English). This operator exploits that the order
  * key is a uniform hash string, so its leading hex pair splits every
  * group into 256 sub-ranges whose order is consistent with the full
  * key:
  *
  *   1. count rows per (group, bucket) — one partial-aggregated shuffle
  *      carrying ≤ groups×256 rows;
  *   2. cumulative counts over that driver-scale table find each
  *      group's boundary bucket — the single bucket where the quota
  *      falls;
  *   3. buckets wholly below the boundary keep ALL rows (map-only
  *      filter against the broadcast bucket table — no shuffle, no
  *      sort); buckets above drop entirely; ONLY the boundary bucket —
  *      ~1/256 of the group — is ranked, in a window partitioned by
  *      (group, bucket).
  *
  * Result rows are exactly those the whole-group window would select
  * (QuotaSelectSpec pins the equivalence); the q28 DuckDB oracles keep
  * the single-window formulation, which is the cross-engine proof.
  */
object QuotaSelect {

  /** Rows of `df` whose rank under (`keyCol` asc, `tieCol` asc) within
    * `groupCol` is ≤ that group's quota. `keyCol` must be a uniformly
    * distributed lowercase-hex string (md5 of a unique id);
    * (`keyCol`, `tieCol`) must be a total order within each group.
    * `quotas` has columns (`groupCol`, quota: Long) and must be small
    * (one row per group — it is broadcast). Groups absent from
    * `quotas` are dropped; quotas above a group's size keep the whole
    * group. Payload columns pass through untouched.
    */
  def select(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      tieCol: String,
      quotas: DataFrame): DataFrame = {
    val b = df.withColumn("_qs_b", substring(col(keyCol), 1, 2))
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("_qs_b"))
    val buckets = b
      .groupBy(col(groupCol), col("_qs_b"))
      .agg(count(lit(1)).as("_qs_n"))
      .withColumn("_qs_before",
        coalesce(sum(col("_qs_n")).over(
          wc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(quotas.withColumnRenamed("quota", "_qs_quota"), Seq(groupCol))
      .select(col(groupCol), col("_qs_b"), col("_qs_n"), col("_qs_before"),
        col("_qs_quota"))
    val ann = b.join(broadcast(buckets), Seq(groupCol, "_qs_b"))
    val keepAll = ann
      .filter(col("_qs_before") + col("_qs_n") <= col("_qs_quota"))
    val wb = Window.partitionBy(col(groupCol), col("_qs_b"))
      .orderBy(col(keyCol), col(tieCol))
    val boundary = ann
      .filter(col("_qs_before") < col("_qs_quota") &&
        col("_qs_before") + col("_qs_n") > col("_qs_quota"))
      .withColumn("_qs_rn", row_number().over(wb))
      .filter(col("_qs_rn") <= col("_qs_quota") - col("_qs_before"))
      .drop("_qs_rn")
    keepAll.unionByName(boundary)
      .drop("_qs_b", "_qs_n", "_qs_before", "_qs_quota")
  }
}
