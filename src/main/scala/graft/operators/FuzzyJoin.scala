package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join via deletion-neighborhood blocking.
  *
  * Candidate generation: every word emits all variants reachable by
  * deleting up to `maxDist` characters; two words within edit distance
  * `maxDist` ALWAYS share a variant — take any optimal alignment with
  * d <= maxDist edit operations and delete, on each side, the characters
  * touched by an edit (substituted chars on both sides, inserted chars
  * on the side that has them): both sides reduce to the same string with
  * <= d deletions each. Joining on the variant key is therefore a
  * complete candidate generator, and the exact levenshtein filter only
  * runs on candidates. Candidates are bounded by words sharing a
  * variant — O(vocab · L^maxDist) keys — never vocab², which is what
  * makes a fuzzy join feasible on a real vocabulary (the reference
  * cross-join formulation lives only in the DuckDB oracle).
  *
  * Distance capped at 2: the variant count is C(L,2)-ish per word, and
  * larger radii need a different algorithm (trie/automaton) anyway.
  */
object FuzzyJoin {

  /** All strings reachable from `w` by deleting up to `maxDist` chars
    * (including `w` itself), deduplicated.
    */
  def deletionVariants(w: String, maxDist: Int): Seq[String] = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist $maxDist not in [1, 2]")
    def delete1(x: String): Seq[String] =
      x.indices.map(i => x.substring(0, i) + x.substring(i + 1))
    val d1 = delete1(w).distinct
    val all =
      if (maxDist == 1) Seq(w) ++ d1
      else Seq(w) ++ d1 ++ d1.flatMap(delete1)
    all.distinct
  }

  /** All pairs (w1 < w2) from `words` with levenshtein <= maxDist,
    * as (w1, w2, dist) with dist BIGINT. `words` need not be distinct.
    */
  def pairsWithin(words: Dataset[String], maxDist: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val variants = words.distinct()
      .flatMap(w => deletionVariants(w, maxDist).map(v => (w, v)))
      .toDF("w", "v")
    variants.as("a").join(variants.as("b"), Seq("v"))
      .filter(col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct()
      .withColumn("dist", levenshtein(col("w1"), col("w2")).cast("bigint"))
      .filter(col("dist") <= maxDist)
  }
}
