package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Corpus-preparation operators a training-data pipeline runs between raw
  * text and the trainer: overlapping document chunking, fixed-budget
  * sequence packing, and BM25 relevance scoring (the retrieval primitive
  * behind quality-by-query filtering and RAG corpus construction).
  *
  * All three are single-scan shapes: chunking is explode-per-doc,
  * packing is one window cumsum per language partition, BM25 is one
  * conditional-aggregation pass with fixed-order term summation (so the
  * double arithmetic is evaluation-order identical in both engines).
  */
object Corpus {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[QueryDef] = Seq(

    // -------------------------------------------- overlapping chunking
    // Split each document into word windows of 32 with stride 24 (25%
    // overlap) — the context-window preprocessing for embedding or
    // training jobs. One explode per document: rows scale with
    // total_tokens/stride, the shuffle key stays (doc_id, start), and no
    // state crosses documents, so the operator is embarrassingly
    // parallel at any corpus size.
    QueryDef(
      "q25_chunking",
      (s, dir) => {
        val w = TextFns.tokens(col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"), w.as("w"))
          .select(col("doc_id"), col("w"),
            explode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
              lit(24))).as("start"))
          .filter(col("start") < size(col("w")))
          .select(col("doc_id"), col("start").cast("long").as("start"),
            least(lit(32), size(col("w")) - col("start")).cast("long")
              .as("chunk_words"),
            element_at(col("w"), col("start") + 1).as("first_tok"),
            element_at(col("w"), least(col("start") + 32, size(col("w"))))
              .as("last_tok"))
          .orderBy("doc_id", "start")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |c AS (SELECT doc_id, w,
             |        unnest(range(0, greatest(len(w), 1), 24)) AS start
             |      FROM d)
             |SELECT doc_id, CAST(start AS BIGINT) AS start,
             |  CAST(least(32, len(w) - start) AS BIGINT) AS chunk_words,
             |  w[start + 1] AS first_tok,
             |  w[least(start + 32, len(w))] AS last_tok
             |FROM c WHERE start < len(w)
             |ORDER BY doc_id, start""".stripMargin)),

    // ------------------------------------------ fixed-budget packing
    // Pack documents into 512-token training sequences, per language:
    // deterministic contiguous fill in doc_id order — a document's bin is
    // floor((cumulative_tokens - own_tokens) / budget). One window cumsum
    // per language partition (shuffle on lang only), then a tiny
    // aggregate; the bin assignment never looks at other partitions, so
    // the plan is two narrow shuffles regardless of corpus size.
    QueryDef(
      "q25_seq_packing",
      (s, dir) => {
        val win = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(win))
          .withColumn("bin", floor((col("cum") - col("n_tok")) / 512).cast("long"))
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
          .orderBy("lang", "bin")
      },
      Some("""WITH d AS (
             |  SELECT lang, doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT lang, doc_id, n_tok,
             |         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             |                          ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM d)
             |SELECT lang, CAST(floor((cum - n_tok) / 512) AS BIGINT) AS bin,
             |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens
             |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin)),

    // ---------------------------------------------------- BM25 scoring
    // Okapi BM25 (k1=1.2, b=0.75) for a fixed 3-term query, top-10 docs.
    // Corpus statistics (N, avgdl, per-term document frequency) come from
    // one aggregate broadcast back as scalars; per-document scoring is
    // then a single scan. The three term scores are summed in FIXED
    // order (s1+s2+s3 written out, not an aggregate), so both engines
    // evaluate the identical double expression tree. At 100 TB the
    // stats pass and the scan pass are each one job; for many queries,
    // terms become a broadcast dimension joined by token instead.
    QueryDef(
      "q25_bm25",
      (s, dir) => {
        val terms = Seq("spark", "hash", "vector")
        val k1 = 1.2; val b = 0.75
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
          .withColumn("dl", size(col("w")).cast("double"))
        def tf(term: String): Column =
          size(filter(col("w"), x => x === term)).cast("double")
        val aggCols =
          count(lit(1)).cast("double").as("n_docs") +:
            sum(col("dl").cast("decimal(38,0)")).cast("double").as("sum_dl") +:
            terms.map(tr =>
              sum(when(tf(tr) > 0, 1).otherwise(0)).cast("double").as(s"df_$tr"))
        val stats = docs.agg(aggCols.head, aggCols.tail: _*)
        val scored = docs.crossJoin(broadcast(stats))
        def idf(tr: String): Column =
          log((col("n_docs") - col(s"df_$tr") + 0.5) / (col(s"df_$tr") + 0.5) + 1.0)
        def termScore(tr: String): Column = {
          val f = tf(tr)
          idf(tr) * (f * (k1 + 1.0)) /
            (f + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
              (col("sum_dl") / col("n_docs"))))
        }
        scored
          .select(col("doc_id"),
            round(termScore(terms(0)) + termScore(terms(1)) + termScore(terms(2)), 6)
              .as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(10)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS w,
             |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
             |  FROM documents),
             |stats AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             |         CAST(sum(CAST(dl AS DECIMAL(38,0))) AS DOUBLE) AS sum_dl,
             |         CAST(sum(CASE WHEN len(list_filter(w, x -> x = 'spark')) > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
             |         CAST(sum(CASE WHEN len(list_filter(w, x -> x = 'hash')) > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_hash,
             |         CAST(sum(CASE WHEN len(list_filter(w, x -> x = 'vector')) > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_vector
             |  FROM d)
             |SELECT doc_id,
             |  round(
             |    ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0)
             |      * (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) * (1.2 + 1.0))
             |      / (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE)
             |         + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
             |    + ln((n_docs - df_hash + 0.5) / (df_hash + 0.5) + 1.0)
             |      * (CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE) * (1.2 + 1.0))
             |      / (CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE)
             |         + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
             |    + ln((n_docs - df_vector + 0.5) / (df_vector + 0.5) + 1.0)
             |      * (CAST(len(list_filter(w, x -> x = 'vector')) AS DOUBLE) * (1.2 + 1.0))
             |      / (CAST(len(list_filter(w, x -> x = 'vector')) AS DOUBLE)
             |         + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs))), 6)
             |    AS bm25
             |FROM d, stats
             |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

    // ----------------------------------- end-to-end pipeline composition
    // The full training-data pipeline in ONE dataflow, with per-stage
    // loss accounting: raw corpus → quality filter (length + stopword
    // ratio, q25 semantics) → exact dedup (md5 fingerprint, keep lowest
    // doc_id) → per-domain mixture cap (md5-rank sampling, q28
    // semantics) → 512-token sequence packing (q25 packing semantics).
    // Output is the per-language pipeline report: docs surviving each
    // stage, sequences produced, tokens shipped. Every stage is a
    // shuffle keyed by text-hash or lang — the whole pipeline is four
    // narrow shuffles over a progressively SHRINKING dataset, no stage
    // ever rescans the raw corpus. This is the query a pipeline owner
    // actually runs nightly; its oracle recomputes all four stages in
    // SQL, so any drift in any stage breaks the hash.
    QueryDef(
      "q43_pipeline_e2e",
      (s, dir) => {
        val toks = TextFns.tokens(col("text"))
        val enStops = TextFns.langStopwords.toMap.apply("en")
        val keep = (size(toks) >= 20) &&
          (TextFns.stopwordCount(col("text"), enStops).cast("double") /
            size(toks).cast("double") >= 0.02)
        val raw = t(s, dir, "documents")
        val quality = raw.filter(keep)
          .select(col("doc_id"), col("lang"), col("text"),
            size(toks).cast("long").as("n_tok"))
        val dedupW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
        val deduped = quality
          .withColumn("dn", row_number().over(dedupW))
          .filter(col("dn") === 1).drop("dn", "text")
        val cap = when(col("lang") === "en", 1200)
          .when(col("lang").isin("de", "fr"), 400).otherwise(150)
        val mixW = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        val mixed = deduped
          .withColumn("rn", row_number().over(mixW))
          .filter(col("rn") <= cap)
        val packW = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        val packed = mixed
          .withColumn("cum", sum(col("n_tok")).over(packW))
          .withColumn("bin", floor((col("cum") - col("n_tok")) / 512).cast("long"))
        def perLang(df: DataFrame, name: String): DataFrame =
          df.groupBy("lang").agg(count(lit(1)).as(name))
        perLang(raw, "n_raw")
          .join(perLang(quality, "n_quality"), Seq("lang"), "left")
          .join(perLang(deduped, "n_dedup"), Seq("lang"), "left")
          .join(packed.groupBy("lang").agg(
            count(lit(1)).as("n_mix"),
            countDistinct(col("bin")).as("n_seqs"),
            sum(col("n_tok")).as("mix_tokens")), Seq("lang"), "left")
          .select(col("lang"),
            col("n_raw"),
            coalesce(col("n_quality"), lit(0L)).as("n_quality"),
            coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
            coalesce(col("n_mix"), lit(0L)).as("n_mix"),
            coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
            coalesce(col("mix_tokens"), lit(0L)).as("mix_tokens"))
          .orderBy("lang")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, text, string_split(text, ' ') AS w
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, lang, text, CAST(len(w) AS BIGINT) AS n_tok
             |  FROM tok
             |  WHERE len(w) >= 20 AND
             |    CAST(len([t FOR t IN w IF t IN
             |      ('the','a','of','and','to','in','is','it')]) AS DOUBLE)
             |      / len(w) >= 0.02),
             |d AS (
             |  SELECT doc_id, lang, n_tok,
             |         row_number() OVER (PARTITION BY md5(text)
             |           ORDER BY doc_id) AS dn
             |  FROM q),
             |dd AS (SELECT doc_id, lang, n_tok FROM d WHERE dn = 1),
             |m AS (
             |  SELECT doc_id, lang, n_tok,
             |         row_number() OVER (PARTITION BY lang
             |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM dd),
             |mm AS (
             |  SELECT doc_id, lang, n_tok FROM m
             |  WHERE rn <= CASE WHEN lang = 'en' THEN 1200
             |                   WHEN lang IN ('de', 'fr') THEN 400
             |                   ELSE 150 END),
             |p AS (
             |  SELECT lang, doc_id, n_tok,
             |         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             |                          ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM mm),
             |pb AS (
             |  SELECT lang, n_tok,
             |         CAST(floor((cum - n_tok) / 512) AS BIGINT) AS bin
             |  FROM p),
             |rawc AS (SELECT lang, count(*) AS n_raw FROM documents GROUP BY 1),
             |qc AS (SELECT lang, count(*) AS n_quality FROM q GROUP BY 1),
             |dc AS (SELECT lang, count(*) AS n_dedup FROM dd GROUP BY 1),
             |mc AS (SELECT lang, count(*) AS n_mix,
             |         CAST(count(DISTINCT bin) AS BIGINT) AS n_seqs,
             |         CAST(sum(n_tok) AS BIGINT) AS mix_tokens
             |       FROM pb GROUP BY 1)
             |SELECT r.lang, r.n_raw,
             |  coalesce(qc.n_quality, 0) AS n_quality,
             |  coalesce(dc.n_dedup, 0) AS n_dedup,
             |  coalesce(mc.n_mix, 0) AS n_mix,
             |  coalesce(mc.n_seqs, 0) AS n_seqs,
             |  coalesce(mc.mix_tokens, 0) AS mix_tokens
             |FROM rawc r
             |LEFT JOIN qc ON qc.lang = r.lang
             |LEFT JOIN dc ON dc.lang = r.lang
             |LEFT JOIN mc ON mc.lang = r.lang
             |ORDER BY r.lang""".stripMargin),
      bench = true)
  )
}
