package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.WordShingles

/** Corpus lexical statistics — the q50 family: collocation mining and
  * per-source lexical-diversity profiling, the descriptive-statistics
  * side of corpus curation (what UMass/UCI topic-coherence metrics and
  * dataset datasheets are built from).
  *
  * Engine-exactness rule (same as q48): every reported ratio is ONE
  * IEEE double division of two exactly-representable integers (products
  * kept < 2^53), so Spark and DuckDB produce bit-identical doubles and
  * the driver's hash compare holds. No logs anywhere — log is monotone,
  * so ranking by the raw likelihood ratio ("lift", log of which is PMI)
  * orders identically to PMI while staying in exact-integer land.
  */
object Lexical {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[QueryDef] = Seq(

    // ------------------------------------------- collocation mining
    // Adjacent-bigram collocations scored by document-co-occurrence
    // lift: lift(a,b) = D(ab)·N / (D(a)·D(b)) where D() counts the
    // documents containing the adjacent pair / the word (the UMass-
    // coherence counting style; log(lift) is PMI). Shapes: the corpus
    // is scanned twice through the codegen'd WordShingles expression
    // (distinct 1-grams, distinct 2-grams per doc), each count is one
    // partial-aggregated shuffle on the term; the unigram table is
    // vocab-scale, so both dictionary joins broadcast; N comes from a
    // 1-row aggregate cross-joined in. The min-df filter (>= 5) runs
    // BEFORE the joins, so only surviving bigrams are looked up.
    QueryDef(
      "q50_collocations",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val uni = docs
          .select(explode(WordShingles.word_shingles(col("text"), 1)).as("wd"))
          .groupBy(col("wd")).agg(count(lit(1)).as("c"))
        val big = docs
          .select(explode(WordShingles.word_shingles(col("text"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n_docs_pair"))
          .filter(col("n_docs_pair") >= 5)
        val nd = docs.agg(count(lit(1)).as("nd"))
        big
          .withColumn("wa", split(col("bigram"), " ").getItem(0))
          .withColumn("wb", split(col("bigram"), " ").getItem(1))
          .join(broadcast(uni.withColumnRenamed("c", "n_docs_a")
            .withColumnRenamed("wd", "wa")), "wa")
          .join(broadcast(uni.withColumnRenamed("c", "n_docs_b")
            .withColumnRenamed("wd", "wb")), "wb")
          .crossJoin(broadcast(nd))
          .select(col("bigram"), col("n_docs_pair"),
            col("n_docs_a"), col("n_docs_b"),
            ((col("n_docs_pair") * col("nd")).cast("double") /
              (col("n_docs_a") * col("n_docs_b")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |uni AS (SELECT u AS wd, count(*) AS c
             |        FROM (SELECT unnest(list_distinct(w)) AS u FROM d) GROUP BY 1),
             |big AS (SELECT b AS bigram, count(*) AS n_docs_pair FROM
             |        (SELECT unnest(list_distinct(
             |           [w[i] || ' ' || w[i+1] FOR i IN range(1, greatest(len(w), 1))])) AS b
             |         FROM d WHERE len(w) >= 2) GROUP BY 1),
             |n AS (SELECT count(*) AS nd FROM documents)
             |SELECT bigram, n_docs_pair, ua.c AS n_docs_a, ub.c AS n_docs_b,
             |       CAST(n_docs_pair * nd AS DOUBLE) /
             |         CAST(ua.c * ub.c AS DOUBLE) AS lift
             |FROM big, n, uni ua, uni ub
             |WHERE n_docs_pair >= 5
             |  AND ua.wd = string_split(bigram, ' ')[1]
             |  AND ub.wd = string_split(bigram, ' ')[2]
             |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin)),

    // --------------------------------------- per-source lexical diversity
    // The datasheet row a curation pipeline wants per source: token
    // mass, vocabulary size, type-token ratio, and inverse Simpson
    // concentration (effective vocabulary size; low = a few terms
    // dominate, the boilerplate smell). One (source, term) shuffle with
    // map-side combine, then a 20-key rollup. Exactness bound: ttr and
    // inv_simpson are single divisions of exact BIGINTs, bit-identical
    // while n_tokens < ~9.4e7 per source (n_tokens^2 < 2^53); past
    // that, ship the integer numerator/denominator instead.
    QueryDef(
      "q50_source_diversity",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_terms"),
            sum(col("c") * col("c")).as("sum_c2"))
          .select(col("source"), col("n_tokens"), col("n_terms"),
            (col("n_terms").cast("double") / col("n_tokens").cast("double"))
              .as("ttr"),
            ((col("n_tokens") * col("n_tokens")).cast("double") /
              col("sum_c2").cast("double")).as("inv_simpson"))
          .orderBy("source"),
      Some("""WITH toks AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
             |tc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
             |agg AS (SELECT source,
             |          CAST(sum(c) AS BIGINT) AS n_tokens,
             |          CAST(count(*) AS BIGINT) AS n_terms,
             |          CAST(sum(c*c) AS BIGINT) AS sum_c2
             |        FROM tc GROUP BY 1)
             |SELECT source, n_tokens, n_terms,
             |  CAST(n_terms AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
             |  CAST(n_tokens * n_tokens AS DOUBLE) / CAST(sum_c2 AS DOUBLE)
             |    AS inv_simpson
             |FROM agg ORDER BY source""".stripMargin)),

    // ---------------------- sparse lexical cosine (tf inverted index)
    // Frequency-weighted doc-doc lexical similarity — the sparse-vector
    // counterpart of q24's dense cosine and the set-based
    // q23_jaccard_pairs: docs as integer term-frequency vectors, pair
    // dots generated from an inverted index (postings-list join), so
    // work is Σ_term df² — bounded by RELATIVE max-df pruning (terms in
    // more than N/10 of the corpus are dropped BEFORE any pair is
    // formed: sklearn's max_df, the lexical analogue of the LSH bucket
    // cap; ubiquitous terms carry no similarity signal anyway). The
    // predicate is the integer form `df * 10 <= N` so both engines cut
    // at exactly the same term. Norms are computed over the same pruned
    // vocabulary, so the reported value is the exact cosine in
    // content-term space. Terms are xxhash64'd before both shuffles (no
    // raw strings move); the oracle groups the raw strings — identical
    // barring a 2^-64 collision, the standard hashed-gram trade. All
    // arithmetic is integer until one double division per pair.
    QueryDef(
      "q57_sparse_cosine",
      (s, dir) =>
        sparseCosinePairs(t(s, dir, "documents"), 10)
          .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
          .limit(20),
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
             |kept AS (SELECT term FROM (
             |           SELECT term, count(*) AS df FROM tf GROUP BY 1)
             |         WHERE df * 10 <= (SELECT count(*) FROM documents)),
             |p AS (SELECT tf.* FROM tf JOIN kept USING (term)),
             |n2 AS (SELECT doc_id, sum(tf * tf) AS n2 FROM p GROUP BY 1),
             |d AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         sum(a.tf * b.tf) AS dot
             |  FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot,
             |  round(CAST(dot AS DOUBLE) /
             |        (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
             |        6) AS cosine
             |FROM d JOIN n2 na ON d.doc_a = na.doc_id
             |       JOIN n2 nb ON d.doc_b = nb.doc_id
             |ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""".stripMargin),
      bench = true)
  )

  /** Exact cosine over integer tf vectors in pruned content-term space,
    * pairs generated from an inverted index. Input needs (doc_id, text).
    * Terms in more than N/dfDenom of the corpus are dropped BEFORE pair
    * expansion (relative max-df pruning — per-term pair work is then
    * ≤ (N/dfDenom)², the lexical analogue of the LSH bucket cap); norms
    * use the same pruned vocabulary so the value is an exact cosine in
    * that space. Terms are xxhash64'd pre-shuffle.
    */
  def sparseCosinePairs(docs: DataFrame, dfDenom: Int): DataFrame = {
    val n = docs.select(count(lit(1)).as("n"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"), xxhash64(col("term")).as("th"))
      .groupBy("doc_id", "th").agg(count(lit(1)).as("tf"))
    val kept = tf.groupBy("th").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") * lit(dfDenom.toLong) <= col("n"))
    val p = tf.join(kept.select("th"), Seq("th"))
    val n2 = p.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = p.as("a")
      .join(p.as("b"),
        col("a.th") === col("b.th") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.tf") * col("b.tf")).as("x"))
      .groupBy("doc_a", "doc_b").agg(sum(col("x")).as("dot"))
    dots
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("na")), "doc_a")
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("dot"),
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
          .as("cosine"))
  }
}
