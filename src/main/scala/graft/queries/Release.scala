package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, WordShingles}

/** Corpus release operations — the q46 family: the bookkeeping a data
  * release runs between two corpus versions and before freezing a
  * tokenizer.
  *
  * - Version diff: added/removed/changed/unchanged accounting between
  *   two corpus snapshots (full-outer join on the doc key, fingerprint
  *   compare) — the release-notes table.
  * - OOV rate: learn a top-N vocabulary from the corpus, then measure
  *   each language's out-of-vocabulary token rate against it — the
  *   check that a frozen tokenizer still covers a drifting corpus.
  * - BPE pair mining: within-word adjacent character-pair frequencies
  *   (the statistic the first BPE merge is chosen from; q25_bpe_tokens
  *   covers the pretokenizer side).
  *
  * The two "versions" in q46_version_diff are derived deterministically
  * from the documents table (drop-by-modulus + synthetic edits) so the
  * DuckDB oracle can rebuild them exactly; the diff logic itself never
  * looks at how the snapshots were made.
  */
object Release {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Snapshot diff between `(doc_id, source, fp_old)` and `(doc_id,
    * source_new, fp_new)`: per-(source, status) counts with status ∈
    * added | removed | changed | unchanged. Exposed for unit testing.
    */
  def versionDiff(old: DataFrame, neu: DataFrame): DataFrame =
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source"), col("source_new")).as("source"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")

  /** Per-language OOV rate of `(lang, word)` tokens against the corpus'
    * own top-`vocabSize` vocabulary (count desc, word asc). Exposed for
    * unit testing.
    */
  def oovRate(tok: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = tok.groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc).limit(vocabSize)
      .select(col("word"), lit(true).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("word"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
      .orderBy("lang")
  }

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------- corpus version diff
    // old = corpus minus (doc_id % 13 = 5), with doc_id % 7 = 3 texts in
    // their pre-edit (uppercased) form; new = corpus minus
    // (doc_id % 11 = 2). Full-outer join on doc_id, md5 compare where
    // both exist. Scale: one shuffle per side on the join key; the
    // output is one row per (source, status) — release-notes scale.
    QueryDef(
      "q46_version_diff",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val old = d.filter(col("doc_id") % 13 =!= 5)
          .select(col("doc_id"), col("source"),
            md5(when(col("doc_id") % 7 === 3, upper(col("text")))
              .otherwise(col("text"))).as("fp_old"))
        val neu = d.filter(col("doc_id") % 11 =!= 2)
          .select(col("doc_id"), col("source").as("source_new"),
            md5(col("text")).as("fp_new"))
        versionDiff(old, neu)
      },
      Some("""WITH old AS (
             |  SELECT doc_id, source,
             |    md5(CASE WHEN doc_id % 7 = 3 THEN upper(text) ELSE text END)
             |      AS fp_old
             |  FROM documents WHERE doc_id % 13 <> 5),
             |neu AS (
             |  SELECT doc_id, source AS source_new, md5(text) AS fp_new
             |  FROM documents WHERE doc_id % 11 <> 2)
             |SELECT coalesce(old.source, neu.source_new) AS source,
             |  CASE WHEN fp_old IS NULL THEN 'added'
             |       WHEN fp_new IS NULL THEN 'removed'
             |       WHEN fp_old = fp_new THEN 'unchanged'
             |       ELSE 'changed' END AS status,
             |  count(*) AS n_docs
             |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---------------------------------------------------------- OOV rate
    // Vocab = top-1000 tokens by (count desc, token asc) over the whole
    // corpus; per-language OOV rate against it. Scale: one explode feeds
    // both the vocab aggregate (top-k = TakeOrderedAndProject, 1000 rows
    // broadcast back) and the per-language join+aggregate — the vocab is
    // the learned artifact, the scoring scan is map-only.
    QueryDef(
      "q46_oov_rate",
      (s, dir) => {
        oovRate(
          t(s, dir, "documents")
            .select(col("lang"),
              explode(TextFns.tokens(col("text"))).as("word")),
          1000)
      },
      Some("""WITH tok AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS word
             |  FROM documents),
             |vocab AS (
             |  SELECT word FROM tok GROUP BY word
             |  ORDER BY count(*) DESC, word LIMIT 1000)
             |SELECT lang, count(*) AS n_tokens,
             |  CAST(sum(CASE WHEN vocab.word IS NULL THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_oov,
             |  round(CAST(sum(CASE WHEN vocab.word IS NULL THEN 1 ELSE 0 END)
             |             AS DOUBLE) / count(*), 6) AS oov_rate
             |FROM tok LEFT JOIN vocab ON tok.word = vocab.word
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ------------------------------------------------- BPE pair mining
    // Adjacent character pairs WITHIN words (never across the space
    // boundary — BPE's word-boundary rule), top 20 by (count desc, pair
    // asc): the argmax of this table is the first BPE merge. Scale: one
    // explode (tokens × positions) + one hash aggregate + top-k; each
    // merge round at tokenizer-training scale is this same statistic
    // over the re-segmented corpus.
    QueryDef(
      "q46_bpe_pairs",
      (s, dir) => {
        val pairs = t(s, dir, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
        pairs.groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(20)
      },
      Some("""WITH w AS (
             |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |p AS (
             |  SELECT unnest(list_transform(range(1, len(w)),
             |                               i -> substring(w, i, 2))) AS pair
             |  FROM w WHERE len(w) >= 2)
             |SELECT pair, count(*) AS n FROM p GROUP BY pair
             |ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // ----------------------------------- inverted contamination join
    // Benchmark decontamination at scale: q25_contamination's substring
    // scan is O(docs × probes) — fine for 4 probes, a non-starter for
    // the millions of eval n-grams a real decontamination pass checks.
    // This is the inverted formulation: explode each doc's distinct
    // word 3-grams ONCE and equi-join them against the probe set — the
    // probe side broadcasts (eval suites are small next to the corpus),
    // the corpus side never shuffles, and cost is linear in corpus
    // tokens regardless of probe count. Match = probe appears as
    // consecutive whitespace tokens.
    QueryDef(
      "q46_contamination_join",
      (s, dir) => {
        val probes = s.createDataFrame(Seq(
          "table key filter", "row column sort", "stream table hash",
          "quantum flux capacitor").map(Tuple1(_))).toDF("probe")
        val grams = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(WordShingles.word_shingles(col("text"), 3)).as("g"))
        // inner join with the probes broadcast (a LEFT join from the
        // 4-row side would force a shuffle of the whole gram stream),
        // then backfill zero-hit probes with a driver-scale outer join
        val hits = grams.join(broadcast(probes), col("g") === col("probe"))
          .groupBy("probe")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
        probes.join(hits, Seq("probe"), "left")
          .select(col("probe"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"))
          .orderBy("probe")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |    unnest(list_distinct(list_transform(range(1, len(w) - 1),
             |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents)
             |  WHERE len(w) >= 3)
             |SELECT p.probe, CAST(count(DISTINCT sh.doc_id) AS BIGINT) AS n_docs
             |FROM (VALUES ('table key filter'), ('row column sort'),
             |             ('stream table hash'), ('quantum flux capacitor'))
             |     p(probe)
             |LEFT JOIN sh ON sh.g = p.probe
             |GROUP BY p.probe ORDER BY p.probe""".stripMargin)),

    // -------------------------------------------- vocab coverage curve
    // How many vocabulary entries cover 50/90/99% of token mass — the
    // statistic that sizes a tokenizer's vocab before training it. The
    // cumulative distribution over frequency-ranked terms comes from
    // `operators/GlobalIndex.withRunningTotal` (distributed prefix sum:
    // one range shuffle of the TERM table — already aggregated, vocab-
    // scale not corpus-scale — local scans, broadcast offsets); the
    // DuckDB oracle is the single-window cumulative formulation.
    QueryDef(
      "q46_vocab_coverage",
      (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        val total = tf.agg(sum(col("cnt")).as("total"))
        val ranked = graft.operators.GlobalIndex
          .withRunningTotal(tf, Seq(col("cnt").desc, col("term").asc),
            "cnt", "pos", "cum", 8)
        ranked.crossJoin(broadcast(total))
          .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("level"),
            col("pos"), col("cum"), col("total"))
          .filter(col("cum").cast("double") >=
            col("level") * col("total").cast("double"))
          .groupBy(col("level"))
          .agg(min(col("pos")).as("n_terms"),
            min_by(col("cum"), col("pos")).as("cum_tokens"),
            max(col("total")).as("total_tokens"))
          .orderBy("level")
      },
      Some("""WITH tf AS (
             |  SELECT t AS term, count(*) AS cnt FROM (
             |    SELECT unnest(string_split(text, ' ')) AS t
             |    FROM documents)
             |  GROUP BY t),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf),
             |r AS (
             |  SELECT term, cnt,
             |    CAST(row_number() OVER (ORDER BY cnt DESC, term)
             |         AS BIGINT) AS pos,
             |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM tf),
             |lv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS level)
             |SELECT lv.level, CAST(min(r.pos) AS BIGINT) AS n_terms,
             |  CAST(min_by(r.cum, r.pos) AS BIGINT) AS cum_tokens,
             |  CAST(max(tot.total) AS BIGINT) AS total_tokens
             |FROM lv, tot, r
             |WHERE CAST(r.cum AS DOUBLE) >= lv.level * CAST(tot.total AS DOUBLE)
             |GROUP BY lv.level ORDER BY lv.level""".stripMargin)),

    // ---------------------------------------------- BPE merge training
    // The actual tokenizer-training loop q46_bpe_pairs is one iteration
    // of: `operators/BpeTrainer` runs 8 distributed merge rounds (each
    // one vocab-scale pair-count shuffle, ONE row to the driver) and
    // returns the merge table. The oracle unrolls the same 8 rounds as
    // chained DuckDB CTEs over the identical parenthesis-delimited
    // symbol representation, so greedy left-to-right application and
    // (freq desc, pair asc) tie-breaks match exactly.
    QueryDef(
      "q46_bpe_train",
      (s, dir) => {
        val wc = t(s, dir, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("w"))
          .filter(col("w").rlike("^[a-z]+$"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        graft.operators.BpeTrainer.train(s, wc, 8).orderBy("merge_rank")
      },
      Some(bpeTrainOracle(8)),
      bench = true),

    // --------------------------------------------- BPE encode (apply)
    // The serving half of the tokenizer: train the 8 merges, then apply
    // them to the vocab as a map-only fold of literal rewrites (the
    // merge table is driver-scale and baked into the plan — this is the
    // shape that encodes 100 TB with zero shuffles), and report the
    // top-20 final symbols by corpus frequency.
    QueryDef(
      "q46_bpe_encode",
      (s, dir) => {
        val wc = t(s, dir, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("w"))
          .filter(col("w").rlike("^[a-z]+$"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        val merges = graft.operators.BpeTrainer.train(s, wc, 8)
          .orderBy("merge_rank").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val sym0 = wc.select(
          regexp_replace(col("w"), "(.)", "($1)").as("s"), col("cnt"))
        graft.operators.BpeTrainer.applyMerges(sym0, merges)
          .select(col("cnt"),
            explode(split(expr("substring(s, 2, length(s) - 2)"),
              "\\)\\(")).as("sym"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("freq"))
          .orderBy(col("freq").desc, col("sym").asc)
          .limit(20)
      },
      Some(bpeEncodeOracle(8)))
  )

  /** Shared CTE chain for the BPE oracles: `n` unrolled merge
    * iterations. w{i} holds the vocab after i merges as `"(sym)(sym)…"`
    * strings; p{i}/b{i} are iteration i's pair counts and argmax
    * choice. `finalVocab` also materializes w{n} (needed by the encode
    * oracle, dead weight for the train oracle).
    */
  private def bpeCtes(n: Int, finalVocab: Boolean): String = {
    val sb = new StringBuilder
    sb ++= """WITH tf AS (
             |  SELECT t AS w, count(*) AS cnt
             |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
             |  WHERE regexp_matches(t, '^[a-z]+$')
             |  GROUP BY t),
             |w0 AS (SELECT regexp_replace(w, '(.)', '(\1)', 'g') AS s, cnt
             |       FROM tf)""".stripMargin
    for (i <- 1 to n) {
      sb ++= s""",
               |p$i AS (
               |  SELECT a[j] AS lhs, a[j + 1] AS rhs,
               |         CAST(sum(cnt) AS BIGINT) AS freq
               |  FROM (SELECT string_split(s[2:-2], ')(') AS a, cnt
               |        FROM w${i - 1}) q,
               |       unnest(range(1, len(a))) AS t(j)
               |  GROUP BY 1, 2),
               |b$i AS (SELECT lhs, rhs, freq FROM p$i
               |        ORDER BY freq DESC, lhs, rhs LIMIT 1)""".stripMargin
      if (i < n || finalVocab) {
        sb ++= s""",
                 |w$i AS (
                 |  SELECT replace(s, '(' || b.lhs || ')(' || b.rhs || ')',
                 |                 '(' || b.lhs || b.rhs || ')') AS s, cnt
                 |  FROM w${i - 1}, b$i b)""".stripMargin
      }
    }
    sb.toString
  }

  private def bpeTrainOracle(n: Int): String =
    bpeCtes(n, finalVocab = false) + (1 to n)
      .map(i => s"SELECT CAST($i AS BIGINT) AS merge_rank, lhs, rhs, freq FROM b$i")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY merge_rank")

  private def bpeEncodeOracle(n: Int): String =
    bpeCtes(n, finalVocab = true) +
      s"""
         |SELECT sym, CAST(sum(cnt) AS BIGINT) AS freq
         |FROM (SELECT unnest(string_split(s[2:-2], ')(')) AS sym, cnt
         |      FROM w$n)
         |GROUP BY sym ORDER BY freq DESC, sym LIMIT 20""".stripMargin
}
