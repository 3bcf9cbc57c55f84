package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.WordShingles

/** Cross-document overlap beyond symmetric near-dup — the q53 family.
  *
  * Jaccard (q23) treats duplication as symmetric, which misses the
  * commonest real contamination shape in web corpora: a SHORT document
  * wholly contained in a LONG one (quoted articles, boilerplate-wrapped
  * reposts, excerpt pages). Containment C(a→b) = |A∩B| / |A| is the
  * asymmetric fix (the measure behind the classic shingling literature's
  * "containment" and modern quote-detection passes): a 50-gram doc fully
  * quoted inside a 5000-gram doc has J ≈ 0.01 but C ≈ 1.0.
  *
  * `q53_ngram_novelty` is the aggregate view of the same postings: what
  * fraction of each source's shingles appear there FIRST (by doc_id
  * ingestion order)? That novelty rate is the standard datasheet metric
  * for how much genuinely new text a source contributes to a growing
  * corpus versus re-crawling what earlier sources already supplied.
  *
  * Shapes: both queries are postings-list plans over the codegen'd
  * [[WordShingles]] scan — shingles are hashed to 8-byte keys BEFORE any
  * shuffle (the q23 trick: distinctness preserved, collision probability
  * 2^-64 per pair), the per-doc set size rides along as a struct field,
  * and no all-pairs self-join exists anywhere. Ratios are ONE division
  * of two exact integer counts, so the DuckDB hash oracle is exact.
  */
object Overlap {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[QueryDef] = Seq(

    // ------------------------------------------------ containment pairs
    // Candidate pairs from shared-shingle postings (linear in Σ df²,
    // like the q23 exact-Jaccard plan), scored asymmetrically: keep a
    // pair when either direction's containment ≥ 0.9. Emits both
    // directions so the consumer can tell "a quotes b" from "b quotes
    // a". At 100 TB the postings would first pass through the LSH
    // band cap (q23's lshCandidatePairs) — here the corpus-exact form
    // doubles as its own oracle.
    QueryDef(
      "q53_containment_pairs",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), WordShingles.word_shingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
        val ex = docs.select(
          struct(col("doc_id"), size(col("sh")).as("sz")).as("d"),
          explode(col("sh")).as("shs"))
          .select(col("d"), xxhash64(col("shs")).as("shingle"))
        ex.groupBy(col("shingle"))
          .agg(sort_array(collect_list(col("d"))).as("ids"))
          .filter(size(col("ids")) > 1)
          .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
          .select(col("a"),
            explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("b"))
          .groupBy(
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
          .agg(count(lit(1)).as("n_inter"))
          .withColumn("c_ab",
            round(col("n_inter").cast("double") / col("sz_a").cast("double"), 6))
          .withColumn("c_ba",
            round(col("n_inter").cast("double") / col("sz_b").cast("double"), 6))
          .filter(col("c_ab") >= 0.9 || col("c_ba") >= 0.9)
          .select(col("doc_a"), col("doc_b"), col("c_ab"), col("c_ba"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              |s AS (SELECT doc_id, ${LlmOps.duckShingles} AS sh FROM d WHERE len(w) >= 3),
              |sz AS (SELECT doc_id, len(sh) AS sz FROM s),
              |ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
              |post AS (SELECT g, list_sort(list(doc_id)) AS ids FROM ex GROUP BY g
              |         HAVING len(list(doc_id)) > 1),
              |e1 AS (SELECT unnest(ids) AS a, ids FROM post),
              |e2 AS (SELECT a, unnest(ids) AS b FROM e1),
              |inter AS (SELECT a AS doc_a, b AS doc_b, count(*) AS n_inter
              |          FROM e2 WHERE a < b GROUP BY 1, 2)
              |SELECT doc_a, doc_b,
              |  round(CAST(n_inter AS DOUBLE) / CAST(za.sz AS DOUBLE), 6) AS c_ab,
              |  round(CAST(n_inter AS DOUBLE) / CAST(zb.sz AS DOUBLE), 6) AS c_ba
              |FROM inter JOIN sz za ON za.doc_id = doc_a
              |           JOIN sz zb ON zb.doc_id = doc_b
              |WHERE round(CAST(n_inter AS DOUBLE) / CAST(za.sz AS DOUBLE), 6) >= 0.9
              |   OR round(CAST(n_inter AS DOUBLE) / CAST(zb.sz AS DOUBLE), 6) >= 0.9
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // -------------------------------------------------- source novelty
    // Per-source novelty: a shingle "belongs" to the doc with the
    // smallest doc_id containing it (ingestion order), and a source's
    // novelty is the fraction of its (doc, shingle) postings that are
    // first occurrences. Shapes: ONE shuffle on the hashed shingle for
    // the min(doc_id) aggregate, a join back on the SAME key (the
    // partitioning is reused — no second exchange of the postings), a
    // per-doc aggregate on doc_id, then a partial-agg rollup to
    // source. The source label rides WITH the postings struct, so no
    // join back to the documents table is ever needed.
    QueryDef(
      "q53_ngram_novelty",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            WordShingles.word_shingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
        val ex = docs.select(col("doc_id"), col("source"),
          explode(col("sh")).as("shs"))
          .select(col("doc_id"), col("source"), xxhash64(col("shs")).as("g"))
        val firsts = ex.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
        ex.join(firsts, "g")
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_first"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_sh")).as("n_grams"),
            sum(col("n_first")).as("n_novel"))
          .withColumn("novelty",
            round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
              |           FROM documents),
              |s AS (SELECT doc_id, source, ${LlmOps.duckShingles} AS sh
              |      FROM d WHERE len(w) >= 3),
              |ex AS (SELECT doc_id, source, unnest(sh) AS g FROM s),
              |firsts AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g),
              |perdoc AS (
              |  SELECT e.doc_id, e.source, count(*) AS n_sh,
              |         sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
              |           AS n_first
              |  FROM ex e JOIN firsts f USING (g) GROUP BY 1, 2)
              |SELECT source, count(*) AS n_docs,
              |  CAST(sum(n_sh) AS BIGINT) AS n_grams,
              |  CAST(sum(n_first) AS BIGINT) AS n_novel,
              |  round(CAST(sum(n_first) AS DOUBLE) / CAST(sum(n_sh) AS DOUBLE), 6)
              |    AS novelty
              |FROM perdoc GROUP BY source ORDER BY source""".stripMargin)))
}
