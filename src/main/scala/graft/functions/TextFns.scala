package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the documents pipeline: tokenization,
  * shingling, quality features, and a stopword-vote language heuristic.
  * All Spark built-ins (codegen'd); every function has an exact DuckDB
  * SQL equivalent so the oracle gate covers them.
  */
object TextFns {

  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, deduplicated. Empty array when the document is
    * shorter than n tokens (guards Spark's descending `sequence`).
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-grams WITH multiplicity (repetition analysis needs counts;
    * [[shingles]] dedups for set similarity). Empty below n tokens.
    */
  def ngrams(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of tokens that appear in `words` (occurrences, not distinct). */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*)))

  /** Punctuation characters per character of text. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
      length(text).cast("double")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric non-space characters.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  /** Stopword sets for the language heuristic (tiny, deterministic). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en"))

  /** Stopword-vote language ID: the language whose stopword list scores
    * the most token hits; ties broken by list order above; no hits at
    * all -> "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val scores = langStopwords.map { case (lang, words) =>
      (lang, stopwordCount(text, words))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first-match-wins: fold from the last list entry outward so the
    // outermost CASE branch tests the first (highest-priority) language
    scores.reverse.foldLeft(lit("und")) { case (els, (lang, score)) =>
      when(score === best && best > 0, lit(lang)).otherwise(els)
    }
  }
}
