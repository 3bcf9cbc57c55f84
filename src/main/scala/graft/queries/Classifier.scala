package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, VectorFns}

/** Classifier-in-the-loop curation — the q45 family: the operations a
  * pipeline runs when a small labeled set (or a target corpus) steers
  * what goes into training data.
  *
  * - kNN label evaluation: leave-one-out k-nearest-neighbor accuracy
  *   over the labeled embedding set — the standard health check before
  *   trusting labels to drive filtering.
  * - Nearest-centroid assignment: the cheap embedding classifier
  *   (per-label mean vector, cosine argmax) used at corpus scale to
  *   score every document against a handful of quality/topic
  *   prototypes (the FineWeb-Edu-style classifier shape).
  * - DSIR importance weights (Xie et al., "Data Selection for Language
  *   Models via Importance Resampling", 2023): hashed-unigram
  *   log-likelihood ratio of a target slice vs the raw corpus, scored
  *   per document — select raw data that looks like the target.
  *
  * Determinism conventions (see QueryDef): similarities are rounded to
  * 6 decimals BEFORE any ranking; every ranking tie-breaks on a unique
  * id; order-sensitive double folds either run in index order on both
  * engines (VectorFns.dot ↔ DuckDB in-order unnest+sum) or go through
  * exact DECIMAL sums of pre-rounded addends.
  */
object Classifier {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Leave-one-out k-NN majority-vote prediction over
    * `(vec_id, embedding, label)`: per-vector top-k neighbors by
    * rounded cosine (ties → lower neighbor id), majority label (ties →
    * more votes, then smaller label). Returns `(vec_id, label, pred)`.
    * Exposed for unit testing.
    */
  def knnPredict(e0: DataFrame, k: Int,
      maxExact: Long = LlmOps.MaxExactAllPairs): DataFrame = {
    // Declared-small-scale exact all-pairs, same refusal stance as
    // cosinePairs/jlCosinePairs (previously uncapped — an oversized
    // input would have silently run the quadratic loop).
    LlmOps.requireSmallExact(e0.select("vec_id"), "knnPredict", maxExact)
    // Norms once per vector, not per pair: the pair stage then runs ONE
    // codegen'd dot fold per pair instead of three (dot + both normSq),
    // the same shape as the oracle's precomputed-norms CTE.
    val withN = e0.select(col("vec_id"), col("embedding"), col("label"),
      sqrt(VectorFns.normSq(col("embedding"))).as("nrm"))
    val a = withN.select(col("vec_id").as("ia"), col("embedding").as("ea"),
      col("label").as("la"), col("nrm").as("na"))
    // limit = the cap just proved, so it never truncates; it stamps a
    // provable bound on the broadcast side for the registry-wide
    // nested-loop guard (WindowGuardSpec). Clamped so an override above
    // Int.MaxValue degrades to a no-op, never wraps.
    val b = withN.select(col("vec_id").as("ib"), col("embedding").as("eb"),
      col("label").as("lb"), col("nrm").as("nb"))
      .limit(math.min(maxExact, Int.MaxValue.toLong).toInt)
    // Exact all-pairs is the oracle-able formulation (cf. q24_cosine_pairs);
    // the 100 TB path replaces the broadcast nested loop with the q24
    // IVF/PQ candidate join and keeps everything downstream unchanged.
    val w = Window.partitionBy("ia").orderBy(col("sim").desc, col("ib").asc)
    val top = a.join(broadcast(b), col("ia") =!= col("ib"))
      .select(col("ia"), col("la"), col("ib"), col("lb"),
        round(VectorFns.dot(col("ea"), col("eb")) /
          (col("na") * col("nb")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    // Argmax by (votes desc, label asc) packed into ONE long so the
    // aggregate is a plain max(bigint) — HashAggregate-able, unlike
    // max(struct) which forces a per-partition SortAggregate on what at
    // corpus scale is the big side. Labels are assumed < 2^20.
    top.groupBy("ia", "la", "lb").agg(count(lit(1)).as("c"))
      .groupBy("ia", "la")
      .agg(max(col("c") * 1048576L + (lit(1048575) - col("lb"))).as("m"))
      .select(col("ia").as("vec_id"), col("la").as("label"),
        (lit(1048575) - col("m") % 1048576L).cast("int").as("pred"))
  }

  /** Per-label centroids as `(label, centroid: array<double>)`, each
    * component an exact 6-decimal value: elements are rounded to 6
    * decimals, summed as DECIMAL (order-independent), divided by the
    * label count, rounded to 6. Exposed for unit testing.
    */
  def labelCentroids(e0: DataFrame): DataFrame =
    e0.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(
        sum(round(col("v").cast("double"), 6).cast("decimal(27,6)"))
          .cast("double") / count(lit(1)), 6).as("cv"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("centroid"))

  /** Hashed bag-of-words count features for the q61 perceptron family:
    * label +1 = long/content-rich doc, 32 md5 token buckets, integer
    * counts. Exposed for the q61 queries and ClassifierSpec.
    */
  def perceptronFeatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        when(col("n_chars") >= 300, 1L).otherwise(-1L).as("y"),
        col("text"))
      .select(col("doc_id"), col("y"),
        explode(TextFns.tokens(col("text"))).as("word"))
      .withColumn("bucket",
        conv(substring(md5(col("word")), 1, 2), 16, 10).cast("long") % 32)
      .groupBy("doc_id", "y", "bucket")
      .agg(count(lit(1)).as("x"))

  /** The q61 training run replayed as SQL: featurize + 4 unrolled
    * batch-perceptron epochs, ending with weight table `w4`, per-epoch
    * mistake sets `m1..m4`, and the final margin table `s5`. Shared by
    * both q61 oracles.
    */
  private[queries] val perceptronSqlPrefix: String =
    """WITH lab AS (
      |  SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
      |         text
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, y,
      |    CAST(((strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 1)
      |            * 16
      |          + (strpos('0123456789abcdef', substring(md5(w), 2, 1)) - 1))
      |         % 32 AS BIGINT) AS bucket,
      |    count(*) AS x
      |  FROM (SELECT doc_id, y, unnest(string_split(text, ' ')) AS w
      |        FROM lab)
      |  GROUP BY 1, 2, 3),
      |feat AS (
      |  SELECT doc_id, y, bucket, CAST(x AS BIGINT) AS x FROM tf
      |  UNION ALL
      |  SELECT doc_id, y, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM lab),
      |w0 AS (SELECT CAST(u.b AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS wt
      |       FROM (SELECT unnest(range(-1, 32)) AS b) u),
      |s1 AS (SELECT f.doc_id, f.y, sum(w.wt * f.x) AS dot
      |       FROM feat f JOIN w0 w USING (bucket) GROUP BY 1, 2),
      |m1 AS (SELECT doc_id FROM s1 WHERE y * dot <= 0),
      |u1 AS (SELECT f.bucket, CAST(sum(f.y * f.x) AS BIGINT) AS dw
      |       FROM feat f JOIN m1 USING (doc_id) GROUP BY 1),
      |w1 AS (SELECT w.bucket, w.wt + coalesce(u.dw, 0) AS wt
      |       FROM w0 w LEFT JOIN u1 u USING (bucket)),
      |s2 AS (SELECT f.doc_id, f.y, sum(w.wt * f.x) AS dot
      |       FROM feat f JOIN w1 w USING (bucket) GROUP BY 1, 2),
      |m2 AS (SELECT doc_id FROM s2 WHERE y * dot <= 0),
      |u2 AS (SELECT f.bucket, CAST(sum(f.y * f.x) AS BIGINT) AS dw
      |       FROM feat f JOIN m2 USING (doc_id) GROUP BY 1),
      |w2 AS (SELECT w.bucket, w.wt + coalesce(u.dw, 0) AS wt
      |       FROM w1 w LEFT JOIN u2 u USING (bucket)),
      |s3 AS (SELECT f.doc_id, f.y, sum(w.wt * f.x) AS dot
      |       FROM feat f JOIN w2 w USING (bucket) GROUP BY 1, 2),
      |m3 AS (SELECT doc_id FROM s3 WHERE y * dot <= 0),
      |u3 AS (SELECT f.bucket, CAST(sum(f.y * f.x) AS BIGINT) AS dw
      |       FROM feat f JOIN m3 USING (doc_id) GROUP BY 1),
      |w3 AS (SELECT w.bucket, w.wt + coalesce(u.dw, 0) AS wt
      |       FROM w2 w LEFT JOIN u3 u USING (bucket)),
      |s4 AS (SELECT f.doc_id, f.y, sum(w.wt * f.x) AS dot
      |       FROM feat f JOIN w3 w USING (bucket) GROUP BY 1, 2),
      |m4 AS (SELECT doc_id FROM s4 WHERE y * dot <= 0),
      |u4 AS (SELECT f.bucket, CAST(sum(f.y * f.x) AS BIGINT) AS dw
      |       FROM feat f JOIN m4 USING (doc_id) GROUP BY 1),
      |w4 AS (SELECT w.bucket, w.wt + coalesce(u.dw, 0) AS wt
      |       FROM w3 w LEFT JOIN u4 u USING (bucket)),
      |s5 AS (SELECT f.doc_id, f.y, CAST(sum(w.wt * f.x) AS BIGINT) AS dot
      |       FROM feat f JOIN w4 w USING (bucket) GROUP BY 1, 2)""".stripMargin

  /** [[perceptronSqlPrefix]] extended with the threshold-sweep CTEs:
    * `tot` (total positives), `g` (per-distinct-margin counts), `c`
    * (cumulative tp / predicted-positive counts in margin-DESC order —
    * the window formulation of the GlobalIndex prefix sums).
    */
  private[queries] val perceptronSweepSql: String =
    perceptronSqlPrefix + ",\n" +
      """tot AS (SELECT CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)
        |                    AS BIGINT) AS pos_total FROM s5),
        |g AS (SELECT dot AS m,
        |        CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS npos,
        |        count(*) AS ntot
        |      FROM s5 GROUP BY 1),
        |c AS (SELECT m,
        |        CAST(sum(npos) OVER (ORDER BY m DESC) AS BIGINT) AS tp,
        |        CAST(sum(ntot) OVER (ORDER BY m DESC) AS BIGINT) AS ctot
        |      FROM g)""".stripMargin

  /** Threshold-sweep curve over per-doc integer margins `(doc_id, y,
    * m)`: one row per distinct margin with exact tp/fp/fn counts
    * (GlobalIndex prefix sums — no partition-less window) and rounded
    * prec/rec/f1 (ONE double division each). Shared by
    * q61_threshold_calibrate and the streaming deploy's operating-point
    * pick.
    */
  def calibrationCurve(marg: DataFrame): DataFrame = {
    import graft.operators.GlobalIndex
    val grouped = marg.groupBy(col("m")).agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("npos"),
      count(lit(1)).as("ntot"))
    // both cumulative counts ride ONE range shuffle + local scan
    val c = GlobalIndex.withRunningTotals(grouped,
        Seq(col("m").desc), Seq("npos", "ntot"), "pos_a",
        Seq("tp", "ctot"), 32)
      .select(col("m"), col("tp"), col("ctot"))
    // A zero-positive-label corpus would make every rec 0/0 = NaN and
    // silently corrupt the best-F1 threshold pick downstream; fail
    // loudly inside the plan instead. assert_true evaluates to NULL
    // when the guard holds, so the added term is exactly zero.
    val totPos = marg.agg(
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("pos_total"))
      .select((col("pos_total") +
        coalesce(assert_true(col("pos_total") > 0,
          lit("calibrationCurve: the corpus has no positive labels — " +
            "rec/f1 would be NaN; check the label column")).cast("long"),
          lit(0L))).as("pos_total"))
    c.crossJoin(broadcast(totPos))
      .select(col("m").as("threshold"), col("tp"),
        (col("ctot") - col("tp")).as("fp"),
        (col("pos_total") - col("tp")).as("fn"),
        round(col("tp").cast("double") / col("ctot"), 9).as("prec"),
        round(col("tp").cast("double") / col("pos_total"), 9).as("rec"),
        round(lit(2.0) * col("tp") /
          (lit(2) * col("tp") + (col("ctot") - col("tp")) +
            (col("pos_total") - col("tp"))), 9).as("f1"))
  }

  /** The calibrated operating point: best-F1 threshold (ties → lower
    * threshold), collected as ONE scalar — the filter cutoff a deploy
    * ships with.
    */
  def calibratedThreshold(marg: DataFrame): Long = {
    val best = calibrationCurve(marg)
      .orderBy(col("f1").desc, col("threshold").asc)
      .limit(1).select("threshold").collect()
    require(best.nonEmpty,
      "calibratedThreshold: no margins to calibrate on (empty input)")
    best(0).getLong(0)
  }

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------ leave-one-out kNN eval
    // Per-label accuracy of 5-NN majority vote. Scale: the pair stage
    // broadcasts the labeled set (a labeled eval set is small by
    // definition — it fits on every executor); the per-vector top-k
    // window shuffles once on vec_id. With an unlabeled corpus on the
    // left this same shape is kNN LABELING at corpus scale.
    QueryDef(
      "q45_knn_eval",
      (s, dir) => {
        val pred = knnPredict(t(s, dir, "embeddings"), 5)
        pred.groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(when(col("pred") === col("label"), 1L).otherwise(0L))
              .as("n_correct"))
          .select(col("label"), col("n"), col("n_correct"),
            round(col("n_correct").cast("double") / col("n"), 6)
              .as("accuracy"))
          .orderBy("label")
      },
      Some("""WITH norms AS (
             |  SELECT vec_id,
             |         sqrt((SELECT sum(CAST(z.x AS DOUBLE) * CAST(z.x AS DOUBLE))
             |               FROM (SELECT unnest(embedding) AS x) z)) AS nrm
             |  FROM embeddings),
             |p AS (
             |  SELECT a.vec_id AS ia, a.label AS la,
             |         b.vec_id AS ib, b.label AS lb,
             |    round(
             |      (SELECT sum(CAST(z.p AS DOUBLE) * CAST(z.q AS DOUBLE))
             |       FROM (SELECT unnest(a.embedding) AS p,
             |                    unnest(b.embedding) AS q) z)
             |      / (na.nrm * nb.nrm), 6) AS sim
             |  FROM embeddings a
             |  JOIN embeddings b ON a.vec_id <> b.vec_id
             |  JOIN norms na ON na.vec_id = a.vec_id
             |  JOIN norms nb ON nb.vec_id = b.vec_id),
             |top AS (
             |  SELECT * FROM p
             |  QUALIFY row_number() OVER (PARTITION BY ia
             |                             ORDER BY sim DESC, ib) <= 5),
             |votes AS (
             |  SELECT ia, la, lb, count(*) AS c FROM top GROUP BY 1, 2, 3),
             |pred AS (
             |  SELECT ia, la, lb AS pred FROM votes
             |  QUALIFY row_number() OVER (PARTITION BY ia
             |                             ORDER BY c DESC, lb) = 1)
             |SELECT la AS label, count(*) AS n,
             |  CAST(sum(CASE WHEN pred = la THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_correct,
             |  round(CAST(sum(CASE WHEN pred = la THEN 1 ELSE 0 END) AS DOUBLE)
             |        / count(*), 6) AS accuracy
             |FROM pred GROUP BY la ORDER BY la""".stripMargin)),

    // -------------------------------------- nearest-centroid classifier
    // Train: per-label mean vector (exact decimal arithmetic → the
    // centroid is identical on any cluster layout). Serve: every vector
    // scored against all 10 centroids — a BROADCAST of 10 rows and a
    // map-only argmax, i.e. the shape that classifies 100 TB in one
    // scan with no shuffle after the (tiny) training aggregate.
    // Output: the label×pred confusion table.
    QueryDef(
      "q45_centroid_assign",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val cent = labelCentroids(e)
          .select(col("label").as("cl"), col("centroid"))
        val sims = e.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("label"), col("cl"),
            round(VectorFns.cosine(col("embedding"), col("centroid")), 6)
              .as("sim"))
        // sim is an exact 6-decimal value, so sim*1e6 is an exact long
        // in [-1e6, 1e6]; offsetting it non-negative and packing
        // (sim6, label) into one bigint keeps the serving argmax a
        // HashAggregate (max(struct) would plan a SortAggregate — a
        // per-partition sort of the full corpus scan).
        sims.groupBy("vec_id", "label")
          .agg(max((round(col("sim") * 1e6).cast("long") + 1000000L) * 1024L +
            (lit(1023) - col("cl"))).as("m"))
          .select(col("vec_id"), col("label"),
            (lit(1023) - col("m") % 1024L).cast("int").as("pred"))
          .groupBy("label", "pred")
          .agg(count(lit(1)).as("n"))
          .orderBy("label", "pred")
      },
      Some("""WITH ex AS (
             |  SELECT vec_id, label, i.i AS pos,
             |         CAST(embedding[i.i] AS DOUBLE) AS v
             |  FROM embeddings, range(1, 65) i(i)),
             |cent AS (
             |  SELECT label AS cl, pos,
             |    round(CAST(sum(CAST(round(v, 6) AS DECIMAL(27,6))) AS DOUBLE)
             |          / count(*), 6) AS cv
             |  FROM ex GROUP BY 1, 2),
             |cvec AS (
             |  SELECT cl, list(cv ORDER BY pos) AS centroid FROM cent
             |  GROUP BY cl),
             |sims AS (
             |  SELECT e.vec_id, e.label, c.cl,
             |    round(
             |      (SELECT sum(CAST(z.p AS DOUBLE) * z.q)
             |       FROM (SELECT unnest(e.embedding) AS p,
             |                    unnest(c.centroid) AS q) z)
             |      / (sqrt((SELECT sum(CAST(z.x AS DOUBLE) * CAST(z.x AS DOUBLE))
             |               FROM (SELECT unnest(e.embedding) AS x) z))
             |         * sqrt((SELECT sum(z.x * z.x)
             |                 FROM (SELECT unnest(c.centroid) AS x) z))), 6)
             |      AS sim
             |  FROM embeddings e, cvec c),
             |pred AS (
             |  SELECT vec_id, label, cl AS pred FROM sims
             |  QUALIFY row_number() OVER (PARTITION BY vec_id
             |                             ORDER BY sim DESC, cl) = 1)
             |SELECT label, pred, count(*) AS n
             |FROM pred GROUP BY label, pred
             |ORDER BY label, pred""".stripMargin),
      bench = true),

    // ------------------------------------- DSIR importance resampling
    // Hashed-unigram (256 buckets via 2 hex chars of md5) importance
    // weights: w(bucket) = ln of the Laplace-smoothed ratio of the
    // bucket's probability in the TARGET slice (lang='en') vs the RAW
    // corpus; a document scores the mean weight of its tokens. Top 20
    // raw non-target docs by score = "select more data that looks like
    // the target". Scale: the weight table is 256 rows (broadcast);
    // one explode + two tiny aggregates + one per-doc aggregate — no
    // all-pairs anything; top-k via TakeOrderedAndProject.
    QueryDef(
      "q45_dsir_weights",
      (s, dir) => {
        // r17 note: a "collapse target/raw/tot into one aggregate"
        // rewrite (plus an input fan-out) was built and MEASURED
        // SLOWER both in-set and solo (1.22 s → 2.01 s solo): on a
        // one-split input the three subtrees each run single-task but
        // CONCURRENTLY (independent stages share the idle cores —
        // guide §2.6), while the fused form serializes one pass behind
        // an added exchange. At production scale the scan parallelizes
        // and the duplicate-subtree cost returns, but that form should
        // be re-derived with a measured win, not kept on faith —
        // reverted (guide §1.1: a fresh "ideal" plan that measures
        // slower goes back).
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(TextFns.tokens(col("text"))).as("word"))
          .withColumn("bucket",
            conv(substring(md5(col("word")), 1, 2), 16, 10).cast("long"))
        val target = tok.filter(col("lang") === "en")
          .groupBy("bucket").agg(count(lit(1)).as("c_t"))
        val raw = tok.groupBy("bucket").agg(count(lit(1)).as("c_r"))
        val tot = tok.agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_t"),
          count(lit(1)).as("n_r"))
        val wts = raw.join(target, Seq("bucket"), "left")
          .na.fill(0L, Seq("c_t"))
          .crossJoin(broadcast(tot))
          .select(col("bucket"),
            round(log(((col("c_t") + 1.0) / (col("n_t") + 256.0)) /
              ((col("c_r") + 1.0) / (col("n_r") + 256.0))), 9).as("w"))
        tok.filter(col("lang") =!= "en")
          .join(broadcast(wts), Seq("bucket"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_tok"),
            round(sum(col("w").cast("decimal(24,9)")).cast("double") /
              count(lit(1)), 6).as("dsir_score"))
          .orderBy(col("dsir_score").desc, col("doc_id").asc)
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, w AS word,
             |    CAST((strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 1)
             |         * 16 +
             |         (strpos('0123456789abcdef', substring(md5(w), 2, 1)) - 1)
             |         AS BIGINT) AS bucket
             |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |        FROM documents)),
             |tgt AS (SELECT bucket, count(*) AS c_t FROM tok
             |        WHERE lang = 'en' GROUP BY 1),
             |raw AS (SELECT bucket, count(*) AS c_r FROM tok GROUP BY 1),
             |tot AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t,
             |               count(*) AS n_r FROM tok),
             |wts AS (
             |  SELECT raw.bucket,
             |    round(ln((CAST(coalesce(c_t, 0) + 1 AS DOUBLE)
             |              / CAST(n_t + 256 AS DOUBLE)) /
             |             (CAST(c_r + 1 AS DOUBLE)
             |              / CAST(n_r + 256 AS DOUBLE))), 9) AS w
             |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot)
             |SELECT doc_id, lang, count(*) AS n_tok,
             |  round(CAST(sum(CAST(w AS DECIMAL(24,9))) AS DOUBLE) / count(*), 6)
             |    AS dsir_score
             |FROM tok JOIN wts USING (bucket)
             |WHERE lang <> 'en'
             |GROUP BY doc_id, lang
             |ORDER BY dsir_score DESC, doc_id LIMIT 20""".stripMargin),
      bench = true),

    // ---------------------------------- batch-perceptron quality filter
    // The TRAINING half of classifier-in-the-loop: a linear quality
    // classifier (hashed bag-of-words counts -> long/content-rich
    // label) trained ON THE CLUSTER with the batch perceptron — the
    // one linear-model trainer whose update step is a commutative
    // integer sum, so the trained weights are bit-identical on any
    // partitioning AND replayable by the SQL oracle (epochs unrolled
    // as CTEs). Scale: featurize once (one map-combined shuffle,
    // persisted); each of the 4 epochs is two keyed shuffles of that
    // table and a <=33-long collect; serving is the same margin
    // aggregate once more. See operators/Perceptron.
    QueryDef(
      "q61_quality_perceptron",
      (s, dir) => {
        import s.implicits._
        val feat = perceptronFeatures(t(s, dir, "documents"))
        val r = graft.operators.Perceptron.train(feat, buckets = 32, epochs = 4)
        val rows: Seq[(String, Long, Long)] =
          (0L until 32L).map(b => ("weight", b, r.weights(b))) ++
            Seq(("bias", -1L, r.weights(graft.operators.Perceptron.BiasBucket))) ++
            r.mistakes.zipWithIndex.map { case (m, i) =>
              ("mistakes", (i + 1).toLong, m)
            } ++
            Seq(("final_errors", 0L, r.finalErrors))
        rows.toDF("kind", "k", "v").orderBy("kind", "k")
      },
      Some(perceptronSqlPrefix + "\n" +
        """SELECT 'weight' AS kind, bucket AS k, wt AS v
             |FROM w4 WHERE bucket >= 0
             |UNION ALL
             |SELECT 'bias', CAST(-1 AS BIGINT), wt FROM w4 WHERE bucket = -1
             |UNION ALL
             |SELECT 'mistakes', CAST(1 AS BIGINT),
             |       (SELECT count(*) FROM m1)
             |UNION ALL
             |SELECT 'mistakes', CAST(2 AS BIGINT),
             |       (SELECT count(*) FROM m2)
             |UNION ALL
             |SELECT 'mistakes', CAST(3 AS BIGINT),
             |       (SELECT count(*) FROM m3)
             |UNION ALL
             |SELECT 'mistakes', CAST(4 AS BIGINT),
             |       (SELECT count(*) FROM m4)
             |UNION ALL
             |SELECT 'final_errors', CAST(0 AS BIGINT),
             |       (SELECT count(*) FROM s5 WHERE y * dot <= 0)
             |ORDER BY kind, k""".stripMargin),
      bench = true),

    // ------------------------------ classifier threshold calibration
    // The step between training a quality scorer and shipping a
    // filter: sweep every candidate threshold over the trained
    // perceptron's per-doc margins and pick the best-F1 operating
    // point (the FineWeb-Edu "score >= 3" cutoff, chosen from data).
    // Margins are integers, so the sweep is engine-exact: cumulative
    // TP / predicted-positive counts over the margin-DESC order come
    // from GlobalIndex.withRunningTotal (the distributed prefix sum —
    // one range shuffle each, NO single-partition window even though
    // distinct margins are corpus-scale in the worst case); precision,
    // recall, F1 are each ONE rounded double division from exact
    // integers. The oracle replays training via the shared CTE prefix
    // and sweeps with the window formulation the operator avoids.
    QueryDef(
      "q61_threshold_calibrate",
      (s, dir) => {
        import graft.operators.Perceptron
        val feat = perceptronFeatures(t(s, dir, "documents"))
        val r = Perceptron.train(feat, buckets = 32, epochs = 4)
        calibrationCurve(Perceptron.margins(Perceptron.withBias(feat), r.weights))
          .orderBy(col("f1").desc, col("threshold").asc)
          .limit(1)
      },
      Some(perceptronSweepSql + "\n" +
        """SELECT m AS threshold, tp, ctot - tp AS fp, pos_total - tp AS fn,
          |  round(CAST(tp AS DOUBLE) / ctot, 9) AS prec,
          |  round(CAST(tp AS DOUBLE) / pos_total, 9) AS rec,
          |  round(2.0 * tp / (2 * tp + (ctot - tp) + (pos_total - tp)), 9)
          |    AS f1
          |FROM c, tot
          |ORDER BY f1 DESC, threshold LIMIT 1""".stripMargin)),

    // ----------------------------- token-budget-constrained selection
    // "Fill a 100k-token training budget with the best data": rank
    // every document by quality-per-token density (trained perceptron
    // margin / token count — ONE rounded double division from exact
    // integers) and take the longest density-ordered prefix whose
    // token mass fits the budget. The prefix cut needs a GLOBAL
    // running total over the density order — GlobalIndex prefix sums,
    // one range shuffle, never a partition-less window. Output: the
    // selected set's size, token mass, total margin, and the cutoff
    // density (the marginal "price" of the last token bought). The
    // oracle replays training + the window-cumsum formulation.
    QueryDef(
      "q66_token_budget_select",
      (s, dir) => {
        import graft.operators.{GlobalIndex, Perceptron}
        val docs = t(s, dir, "documents")
        val feat = perceptronFeatures(docs)
        val r = Perceptron.train(feat, buckets = 32, epochs = 4)
        val marg = Perceptron.margins(Perceptron.withBias(feat), r.weights)
        val toks = docs.select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("t"))
        val d = marg.join(toks, Seq("doc_id"))
          .select(col("doc_id"), col("m"), col("t"),
            round(col("m").cast("double") / col("t"), 9).as("density"))
        val c = GlobalIndex.withRunningTotal(d,
          Seq(col("density").desc, col("doc_id")), "t", "pos", "cum_t", 32)
        c.filter(col("cum_t") <= 100000L)
          .agg(count(lit(1)).as("n_selected"),
            sum(col("t")).as("tok_selected"),
            sum(col("m")).as("margin_mass"),
            round(min(col("density")), 9).as("cutoff_density"))
      },
      Some(perceptronSqlPrefix + ",\n" +
        """d AS (
          |  SELECT s.doc_id, s.dot AS m,
          |    CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS t,
          |    round(CAST(s.dot AS DOUBLE)
          |          / len(string_split(doc.text, ' ')), 9) AS density
          |  FROM s5 s JOIN documents doc ON s.doc_id = doc.doc_id),
          |c AS (
          |  SELECT d.*, CAST(sum(t) OVER (ORDER BY density DESC, doc_id)
          |                   AS BIGINT) AS cum_t
          |  FROM d)
          |SELECT count(*) AS n_selected,
          |  CAST(sum(t) AS BIGINT) AS tok_selected,
          |  CAST(sum(m) AS BIGINT) AS margin_mass,
          |  round(min(density), 9) AS cutoff_density
          |FROM c WHERE cum_t <= 100000""".stripMargin)),

    // ------------------------------ scorer reliability by margin decile
    // The calibration DIAGNOSTIC behind the q61 threshold pick: exact
    // equi-depth margin deciles (GlobalIndex positions + the q48
    // front-loaded ntile arithmetic — proven ≡ window ntile by
    // q48_equidepth_bins — so NO partition-less window over the
    // corpus) with each bin's observed positive rate. A sharp scorer
    // shows monotone pos_rate across deciles; a flat tail is the
    // signal to retrain before trusting any cutoff. One division per
    // bin; everything else integer-exact. Oracle = training replay +
    // the window-ntile formulation.
    QueryDef(
      "q67_margin_reliability",
      (s, dir) => {
        import graft.operators.{GlobalIndex, Perceptron}
        val feat = perceptronFeatures(t(s, dir, "documents"))
        val r = Perceptron.train(feat, buckets = 32, epochs = 4)
        val marg = Perceptron.margins(Perceptron.withBias(feat), r.weights)
        val posn = GlobalIndex.withPosition(marg,
          Seq(col("m"), col("doc_id")), "pos", 32)
        posn.crossJoin(broadcast(marg.agg(count(lit(1)).as("n"))))
          .select(col("m"), col("y"),
            expr(Sampling.ntileExpr(10)).cast("long").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
            round(sum(when(col("y") === 1L, 1L).otherwise(0L))
              .cast("double") / count(lit(1)), 6).as("pos_rate"),
            min(col("m")).as("min_margin"),
            max(col("m")).as("max_margin"))
          .orderBy("bin")
      },
      Some(perceptronSqlPrefix + ",\n" +
        """p AS (
          |  SELECT dot AS m, y,
          |         CAST(ntile(10) OVER (ORDER BY dot, doc_id) AS BIGINT)
          |           AS bin
          |  FROM s5)
          |SELECT bin, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
          |  round(CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          |        / count(*), 6) AS pos_rate,
          |  min(m) AS min_margin, max(m) AS max_margin
          |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // -------------------------- quality pipeline composed (round 7 ops)
    // The round-7 classifier loop deployed inside an export pipeline:
    // calibrated perceptron filter (map-only PerceptronMarginF kernel,
    // cutoff from the q61 sweep) → exact md5 dedup (keep lowest id) →
    // 8 balanced export shards (GlobalIndex size-DESC round-robin, the
    // q58 shape). Per-stage doc/token accounting rides along so the
    // release datasheet shows WHERE mass was lost. Shuffle budget:
    // training's per-epoch pair + one fingerprint aggregate + one
    // range exchange — the filter stage itself moves nothing. The
    // oracle replays training, calibration, filtering, dedup, and
    // sharding end-to-end.
    QueryDef(
      "q64_pipeline_quality",
      (s, dir) => {
        import graft.operators.{GlobalIndex, Perceptron}
        val docs = t(s, dir, "documents")
        val feat = perceptronFeatures(docs)
        val r = Perceptron.train(feat, buckets = 32, epochs = 4)
        val theta = calibratedThreshold(
          Perceptron.margins(Perceptron.withBias(feat), r.weights))
        val kept = docs
          .filter(Perceptron.marginExpr(col("text"), r.weights) >= theta)
          .select(col("doc_id"), col("text"),
            size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
        val fp = kept.withColumn("fp", md5(col("text")))
        val deduped = fp
          .join(fp.groupBy("fp").agg(min(col("doc_id")).as("doc_id")),
            Seq("fp", "doc_id"))
          .select(col("doc_id"), col("n_tokens"))
        val sharded = GlobalIndex
          .withPosition(deduped,
            Seq(col("n_tokens").desc, col("doc_id")), "pos", 32)
          .select(col("n_tokens"), ((col("pos") - 1) % 8).as("shard"))
        def acc(df: DataFrame, kind: String, k: Column) =
          df.groupBy(k.as("k"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_tokens")).as("tok_mass"))
            .select(lit(kind).as("kind"), col("k").cast("long"),
              col("n_docs"), col("tok_mass"))
        acc(sharded, "shard", col("shard"))
          .unionByName(acc(kept, "stage", lit(0L)))
          .unionByName(acc(deduped, "stage", lit(1L)))
          .orderBy("kind", "k")
      },
      Some(perceptronSweepSql + ",\n" +
        """curve AS (SELECT m,
          |    round(2.0 * tp / (2 * tp + (ctot - tp) + (pos_total - tp)), 9)
          |      AS f1
          |  FROM c, tot),
          |best AS (SELECT m FROM curve ORDER BY f1 DESC, m LIMIT 1),
          |kept AS (
          |  SELECT d.doc_id, d.text,
          |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents d JOIN s5 s ON s.doc_id = d.doc_id
          |  WHERE s.dot >= (SELECT m FROM best)),
          |ded AS (
          |  SELECT doc_id, n_tokens FROM kept
          |  QUALIFY row_number() OVER (PARTITION BY md5(text)
          |                             ORDER BY doc_id) = 1),
          |sh AS (
          |  SELECT doc_id, n_tokens,
          |    (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 8
          |      AS shard
          |  FROM ded)
          |SELECT 'shard' AS kind, CAST(shard AS BIGINT) AS k,
          |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tok_mass
          |FROM sh GROUP BY 2
          |UNION ALL
          |SELECT 'stage', CAST(0 AS BIGINT), count(*),
          |       CAST(sum(n_tokens) AS BIGINT) FROM kept
          |UNION ALL
          |SELECT 'stage', CAST(1 AS BIGINT), count(*),
          |       CAST(sum(n_tokens) AS BIGINT) FROM ded
          |ORDER BY kind, k""".stripMargin))
  )
}
