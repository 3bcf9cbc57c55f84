package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the iterative loop
  * that turns the q46_bpe_pairs statistic into an actual merge table.
  *
  * Each word is represented as a parenthesis-delimited symbol string
  * (`"low"` → `"(l)(o)(w)"`); a merge rewrites every boundary-safe
  * occurrence of `"(l)(o)"` to `"(lo)"` left-to-right, which is exactly
  * greedy BPE application (the delimiters make adjacent matches
  * non-overlapping, so `(a)(a)(a)(a)` merges to `(aa)(aa)`, never
  * `(aa)(a)(a)` — a bare space-join would consume the shared
  * separator and miss the second pair).
  *
  * Scale shape: the corpus collapses to the distinct-word count table
  * ONCE (the only corpus-size shuffle, partial-aggregated); every
  * iteration is then one pair-count shuffle over the VOCAB-scale table
  * (key space ≤ live-symbol², heavy map-side combine) of which the
  * driver collects exactly ONE row (the argmax pair), plus a map-only
  * rewrite. This is the textbook distributed tokenizer-training loop:
  * per-iteration driver traffic is O(1), executor work is linear in
  * vocab size, and nothing grows with merge count but the plan depth
  * (bounded here by per-iteration `localCheckpoint` truncation).
  */
object BpeTrainer {

  /** One merge decision: rank (1-based), the two symbols merged, and
    * the corpus frequency of the pair at the time it was chosen.
    */
  case class Merge(merge_rank: Long, lhs: String, rhs: String, freq: Long)

  /** Run `nMerges` BPE merge iterations over `wordCounts` (columns
    * `w: String`, `cnt: Long`; callers pre-filter `w` to a charset that
    * cannot contain parentheses). Ties break by (freq desc, lhs asc,
    * rhs asc) so the merge table is deterministic. Returns one row per
    * merge: `merge_rank, lhs, rhs, freq`. Stops early if no pair is
    * left to merge.
    */
  def train(spark: SparkSession, wordCounts: DataFrame, nMerges: Int): DataFrame = {
    var words = wordCounts
      .select(regexp_replace(col("w"), "(.)", "($1)").as("s"), col("cnt"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val best = words
        .select(col("cnt"),
          split(expr("substring(s, 2, length(s) - 2)"), "\\)\\(").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("cnt"), explode(expr(
          "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1)," +
            " (x, y) -> named_struct('l', x, 'r', y))")).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        merges += Merge(merges.length + 1L, l, r, best(0).getLong(2))
        words = applyMerges(words, Seq((l, r))).localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF()
  }

  /** Apply an ordered merge table to a symbol-string vocab (column `s`
    * in the `"(sym)(sym)…"` representation) — the ENCODE side of the
    * tokenizer: a map-only fold of boundary-safe literal rewrites, one
    * per merge, with the (driver-scale) merge table baked into the
    * plan. No shuffle, no state; this is what runs over 100 TB once
    * training has fixed the merges.
    */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("s",
        regexp_replace(col("s"),
          lit(java.util.regex.Pattern.quote(s"($l)($r)")),
          lit(java.util.regex.Matcher.quoteReplacement(s"($l$r)"))))
    }
}
