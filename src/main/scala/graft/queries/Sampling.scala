package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns
import graft.operators.GlobalIndex

/** Corpus subsampling & compression primitives — the q48 family: the
  * operations that shrink a 100 TB corpus (or its embedding index) to a
  * budgeted subset without a driver-side random() anywhere.
  *
  * - Priority sampling (Duffield–Lund–Thorup): weighted sampling
  *   WITHOUT replacement as a pure top-k — priority = w/u with a
  *   deterministic per-doc uniform, take the k largest. One map over
  *   the scan + a TakeOrderedAndProject; no shuffle of the corpus, and
  *   the same doc set falls out on every run/engine (md5-derived u).
  * - Scalar int8 quantization (the SQ8 of FAISS et al.): per-dimension
  *   min/max over the corpus, codes = floor-scaled bytes, and a
  *   quantized dot-product top-k. All-integer scoring makes the result
  *   engine-exact (no float-sum reassociation anywhere), which is why
  *   the oracle can hash-compare it.
  * - Exact equi-depth binning: ntile(k) semantics over the corpus
  *   WITHOUT the single-partition window — global positions come from
  *   `operators/GlobalIndex` (range shuffle + broadcast offsets), and
  *   the ntile bucket is recomputed from (pos, n) by integer
  *   arithmetic. NOTE: the folklore `(pos-1)*k div n` bucket is NOT
  *   ntile (first counter-example n=7, k=5 — it spreads the remainder
  *   Bresenham-style, ntile front-loads it); the exact front-loaded
  *   form is used and proven against Spark's own ntile in
  *   SamplingSpec.
  */
object Sampling {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** 16-bit deterministic uniform in [0, 65535] from the md5 of a key
    * column (the portable digit-by-digit trick q28_train_split uses:
    * DuckDB has no hex→int cast, so the oracle rebuilds via strpos).
    */
  private[graft] def u16(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** The oracle-side twin of [[u16]]. */
  private[graft] def u16Sql(keyExpr: String): String =
    (1 to 4).map { i =>
      val shift = math.pow(16, 4 - i).toLong
      s"(strpos('0123456789abcdef', substring(md5($keyExpr), $i, 1)) - 1) * $shift"
    }.mkString("(", " +\n       ", ")")

  /** Duffield–Lund–Thorup priority = w·65536/(u16(key)+1): ONE double
    * division of two exactly-represented integers, so every engine and
    * every caller (batch q48, streaming q20_stream_sample, specs)
    * computes bit-identical priorities from one definition.
    */
  private[graft] def priorityCol(
      weight: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (weight * lit(65536L)).cast("double") / (u16(key) + lit(1L)).cast("double")

  /** The oracle-side twin of [[priorityCol]] over the documents table —
    * shared verbatim by q48_priority_sample and q20_stream_sample.
    */
  private[graft] val prioritySampleOracle: String =
    s"""SELECT doc_id, n_chars,
       |  CAST(n_chars * 65536 AS DOUBLE) /
       |    CAST(${u16Sql("CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
       |    AS priority
       |FROM documents
       |ORDER BY priority DESC, doc_id LIMIT 20""".stripMargin

  /** Exact ntile(k) bucket from a 1-based global position and total n,
    * front-loading the remainder like the SQL window function:
    * q = n div k, r = n mod k; the first r buckets hold q+1 rows.
    */
  private[graft] def ntileExpr(k: Int): String =
    s"""CASE WHEN pos <= (n % $k) * ((n div $k) + 1)
       |     THEN (pos - 1) div ((n div $k) + 1) + 1
       |     ELSE (n % $k) + (pos - (n % $k) * ((n div $k) + 1) - 1)
       |            div (n div $k) + 1 END""".stripMargin

  def all: Seq[QueryDef] = Seq(

    // ------------------------------------------------ priority sampling
    // Weighted sampling without replacement, weight = n_chars (long
    // documents are proportionally more likely to be kept — the usual
    // token-budget subsample). priority = w/u with u = (u16+1)/65536:
    // computed as ONE double division of two exactly-represented
    // integers, so Spark and DuckDB produce bit-identical priorities
    // and the top-k sets agree exactly. Scale shape: pure map +
    // TakeOrderedAndProject(k) — nothing but k rows ever leaves an
    // executor, and the sample is reproducible O(1) per doc (append-
    // safe: new docs never perturb old priorities).
    QueryDef(
      "q48_priority_sample",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            priorityCol(col("n_chars"), col("doc_id")).as("priority"))
          .orderBy(col("priority").desc, col("doc_id").asc)
          .limit(20),
      Some(prioritySampleOracle)),

    // ----------------------------------------------- SQ8 quantized ANN
    // Scalar 8-bit quantization of the embedding index: per-dimension
    // [min, max] over the corpus (one partial-aggregated shuffle of
    // 64 keys), codes = floor((v-mn)*255/(mx-mn)) clamped to [0,255],
    // and asymmetric-free integer scoring sum(code·qcode) — a 4×
    // memory cut (float32→int8) with exact integer comparisons, so
    // ties and ordering are engine-independent (contrast the float
    // paths, which need round()). Serving shape at 100 TB: the stats
    // row is index-build output (like PQ codebooks); scoring is a
    // map-side-combined aggregate keyed by vec_id, then top-k.
    QueryDef(
      "q48_sq8_topk",
      (s, dir) => {
        val ex = t(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), (col("pos") + 1).as("i"),
            col("col").cast("double").as("v"))
        val st = ex.groupBy("i").agg(min("v").as("mn"), max("v").as("mx"))
        val codes = ex.join(broadcast(st), "i")
          .select(col("vec_id"), col("i"),
            when(col("mx") === col("mn"), lit(0L))
              .otherwise(greatest(lit(0L), least(lit(255L),
                floor((col("v") - col("mn")) * lit(255.0) /
                  (col("mx") - col("mn"))).cast("long"))))
              .as("code"))
        val q = codes.filter(col("vec_id") === 0)
          .select(col("i"), col("code").as("qcode"))
        codes.filter(col("vec_id") =!= 0)
          .join(broadcast(q), "i")
          .groupBy("vec_id")
          .agg(sum(col("code") * col("qcode")).as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(10)
      },
      Some("""WITH ex AS (
             |  SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS v
             |  FROM embeddings, range(1, 65) i(i)),
             |st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1),
             |c AS (
             |  SELECT vec_id, ex.i,
             |    CASE WHEN mx = mn THEN 0
             |         ELSE greatest(0, least(255,
             |           CAST(floor(((v - mn) * 255.0) / (mx - mn)) AS BIGINT)))
             |    END AS code
             |  FROM ex JOIN st ON ex.i = st.i),
             |q AS (SELECT i, code AS qcode FROM c WHERE vec_id = 0)
             |SELECT c.vec_id, CAST(sum(c.code * q.qcode) AS BIGINT) AS score
             |FROM c JOIN q ON c.i = q.i
             |WHERE c.vec_id <> 0
             |GROUP BY 1 ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)),

    // --------------------------------------------- exact equi-depth bins
    // ntile(10) over (n_chars, doc_id) at corpus scale: positions from
    // the distributed GlobalIndex (ONE range shuffle — the same price
    // any total sort pays — plus a ≤32-row offset broadcast), bucket
    // from (pos, n) integer arithmetic, then a per-bin profile. The
    // oracle is the single-window ntile formulation, so a pass here
    // proves distributed-pos ntile ≡ window ntile on real data.
    QueryDef(
      "q48_equidepth_bins",
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "n_chars")
        val pos = GlobalIndex.withPosition(
          d, Seq(col("n_chars"), col("doc_id")), "pos", 32)
        pos.crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
          .select(col("n_chars"), expr(ntileExpr(10)).cast("long").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("bin")
      },
      Some("""WITH p AS (
             |  SELECT n_chars,
             |         CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
             |           AS bin
             |  FROM documents)
             |SELECT bin, count(*) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --------------------- Johnson–Lindenstrauss reduced-space top-k
    // Random-projection dimensionality reduction (Achlioptas ±1 JL):
    // the map-only compressor that sits in FRONT of every ANN scheme
    // here — 64 dims → 16 before any pairwise work touches the index.
    // The sign matrix is data-independent and derived from md5(j_i)
    // (the portable engine-parity hash), so no randomness crosses the
    // driver and every run/engine sees the same projection. Arithmetic
    // is the house integer-exact style: embeddings go through the SQ8
    // centered int codes (one 64-key min/max shuffle + broadcast),
    // projection r_j = Σ_i c_i·s_ij is an integer sum (order-free, so
    // the (vec_id, j) aggregate is map-side combined), norms are
    // integer, and the reported cosine is one double division of
    // exactly-representable values — hash-comparable across engines.
    // Scale shapes: quantize = 64-key shuffle; project = 1024-row
    // broadcast sign join + n·k-row partial agg; the all-pairs stage
    // is the declared-small-scale exact form (same stance as
    // q24_cosine_pairs) — at 100 TB the 16-dim integer vectors feed
    // the q24 IVF/LSH bucketing instead, which is the entire point of
    // projecting first.
    QueryDef(
      "q56_jl_topk",
      (s, dir) =>
        jlCosinePairs(t(s, dir, "embeddings"), 16)
          .orderBy(col("cosine_red").desc, col("vec_a"), col("vec_b"))
          .limit(20),
      Some("""WITH ex AS (
             |  SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS v
             |  FROM embeddings, range(1, 65) i(i)),
             |st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1),
             |c AS (
             |  SELECT vec_id, ex.i,
             |    (CASE WHEN mx = mn THEN 0
             |          ELSE greatest(0, least(255,
             |            CAST(floor(((v - mn) * 255.0) / (mx - mn)) AS BIGINT)))
             |     END) - 128 AS c
             |  FROM ex JOIN st ON ex.i = st.i),
             |sg AS (
             |  SELECT i.i AS i, j.j AS j,
             |    CASE WHEN substring(md5(CAST(j.j AS VARCHAR) || '_' ||
             |                            CAST(i.i AS VARCHAR)), 1, 1)
             |         IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1
             |    END AS sgn
             |  FROM range(1, 65) i(i), range(0, 16) j(j)),
             |r AS (
             |  SELECT vec_id, j, sum(c * sgn) AS r
             |  FROM c JOIN sg ON c.i = sg.i GROUP BY 1, 2),
             |n2 AS (SELECT vec_id, sum(r * r) AS n2 FROM r GROUP BY 1),
             |d AS (
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |         sum(a.r * b.r) AS dot_red
             |  FROM r a JOIN r b ON a.j = b.j AND a.vec_id < b.vec_id
             |  GROUP BY 1, 2)
             |SELECT vec_a, vec_b, CAST(dot_red AS BIGINT) AS dot_red,
             |  round(CAST(dot_red AS DOUBLE) /
             |        (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
             |        6) AS cosine_red
             |FROM d JOIN n2 na ON d.vec_a = na.vec_id
             |       JOIN n2 nb ON d.vec_b = nb.vec_id
             |WHERE na.n2 > 0 AND nb.n2 > 0
             |ORDER BY cosine_red DESC, vec_a, vec_b LIMIT 20""".stripMargin),
      bench = true),

    // ------------------------------------ balanced export sharding
    // The training-shard writer's balancing step: assign every doc to
    // one of 16 output shards so token mass is near-uniform — greedy
    // LPT approximated as round-robin over the SIZE-DESC global order
    // (each shard takes one doc per "round", so mass spread is bounded
    // by the per-round size decay, not by luck of a hash). The global
    // position comes from operators/GlobalIndex — one range shuffle +
    // a broadcast offset join, NO single-partition row_number window —
    // and shard = (pos-1) mod 16 is stateless integer arithmetic, so
    // the assignment is deterministic and recomputable per doc. The
    // oracle is the single-window formulation, proving distributed pos
    // ≡ row_number once more on a DESC key. Reported: per-shard doc
    // count, token mass, and size envelope.
    QueryDef(
      "q58_balanced_shards",
      (s, dir) =>
        balancedShards(t(s, dir, "documents"), 16, 32)
          .orderBy("shard"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, n_tokens,
             |    (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 16
             |      AS shard
             |  FROM d)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS tok_mass,
             |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // --------------------------- JL projection → bucketed ANN (end-to-end)
    // The composition the q56 pair stage PROMISES: project 64 → 16 dims
    // with the deterministic ±1 JL matrix, then serve cosine top-10
    // through the multi-table multiprobe sign-LSH path — the same
    // serving shape as q24_ann_lsh, but bucketing REDUCED vectors, so
    // both the index (16 ints/vector) and every candidate scoring fold
    // are 4x narrower than raw. No all-pairs stage anywhere: candidates
    // come from (table, key) equi-joins against 56 broadcast probe
    // keys; only candidates are scored. The declared contract is the
    // measurable one (same stance as q24_ann_lsh): result size and
    // recall@10 against the EXACT reduced-space ranking (brute-force
    // over the stored index — one broadcast query row + map +
    // TakeOrderedAndProject, itself scale-safe) — deterministic for the
    // fixed md5-derived projection + hyperplanes, so oracle-hashable.
    QueryDef(
      "q59_jl_ann",
      (s, dir) => {
        val red = jlReducedIndex(t(s, dir, "embeddings"), 16)
        val ann = jlAnnTopK(red, 10)
        // vec_id unique: limit(1) stamps the 1-row bound into the plan
        // for the nested-loop guard, never drops a row
        val q = red.filter(col("vec_id") === 0)
          .select(col("rv").as("qv"), col("n2").as("qn2"))
          .limit(1)
        val exact = red.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(VectorFns.dot(col("rv"), col("qv")) /
              (sqrt(col("n2")) * sqrt(col("qn2"))), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
        exact.select(col("vec_id").as("e_id"))
          .join(ann.select(col("vec_id").as("a_id")),
            col("e_id") === col("a_id"), "left")
          .agg(count(lit(1)).as("n_exact"), count(col("a_id")).as("n_hit"))
          .select(
            col("n_exact"),
            (col("n_hit").cast("double") / col("n_exact") >= 0.6).as("recall_ok"))
      },
      Some("SELECT CAST(10 AS BIGINT) AS n_exact, true AS recall_ok"),
      bench = true)
  )

  /** Round-robin shard assignment over the token-size-DESC global order
    * (approximate LPT balancing), rolled up per shard. Input needs
    * (doc_id, text). The only corpus-size shuffle is GlobalIndex's range
    * exchange; the rollup is a `shards`-key aggregate.
    */
  def balancedShards(docs: DataFrame, shards: Int, parts: Int): DataFrame = {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    GlobalIndex
      .withPosition(d, Seq(col("n_tokens").desc, col("doc_id")), "pos", parts)
      .select(col("doc_id"), col("n_tokens"),
        ((col("pos") - 1) % shards).as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tok_mass"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"))
  }

  /** Centered SQ8 codes → deterministic ±1 JL projection to `k` dims:
    * the reduced index `(vec_id, rv: array<double> of integer values,
    * n2)` every downstream consumer shares (exact pair stage, sign-LSH
    * serving, recall ground truth). The sign matrix is md5-derived from
    * (j, i) only, so the projection is identical on every run, engine,
    * and cluster size. Integer arithmetic throughout — every value is an
    * integer < 2^53 (|r_j| ≤ 128·64, so dots/norms ≤ ~4.3e9), so double
    * folds over rv are exact. Scale shapes: quantize = 64-key shuffle;
    * project = 1024-row broadcast sign join + map-side-combined
    * (vec_id, j) partial agg; reassembly = one shuffle on vec_id.
    */
  def jlReducedVectors(emb: DataFrame, k: Int): DataFrame = {
    // Per-dim [mn, mx] — ONE narrow aggregate, collected as the model
    // (d rows of three scalars — driver-scale, the exact
    // ScalarQuantizer.train discipline). The projection itself is then
    // a pure MAP over the corpus scan via the codegen'd JlProjectF
    // kernel: the previous formulation exploded every vector (n·d
    // rows), broadcast-joined the stats AND the n·d×k sign matrix, and
    // shuffled n·k partial sums through two aggregates — ~10 exchanges
    // per consumer, with the whole subtree re-run per reference (the
    // q56 pair stage reads it twice). Same bits: the kernel evaluates
    // the identical IEEE clamp/floor order per element and an exact
    // long accumulation per output dim (|c| ≤ 128, so no order
    // sensitivity) — parity with the retained SQL reference
    // formulation is pinned in JlKernelSpec.
    val st = emb
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).as("i"), col("col").cast("double").as("v"))
      .groupBy("i").agg(min("v").as("mn"), max("v").as("mx"))
      .collect()
    // Degenerate contract (r17 ADVICE): an empty corpus yields an empty
    // (vec_id, rv, n2) frame — the lazy SQL formulation's behavior —
    // instead of throwing at plan-construction time, so consumers that
    // merely construct these plans (registry sweeps) keep working.
    if (st.isEmpty)
      return emb.limit(0).select(col("vec_id"),
        lit(null).cast("array<double>").as("rv"),
        lit(0.0).as("n2"))
    val d = st.map(_.getAs[Number](0).intValue).max
    val mn = new Array[Double](d)
    val mx = new Array[Double](d)
    st.foreach { r =>
      mn(r.getAs[Number](0).intValue - 1) = r.getDouble(1)
      mx(r.getAs[Number](0).intValue - 1) = r.getDouble(2)
    }
    // Data-independent md5 sign matrix, derived on the driver with the
    // identical hash the SQL formulation (and the q56 oracle) uses:
    // sgn(i, j) = +1 iff the first hex char of md5("<j>_<i>") is 0-7
    // (i 1-based dim, j 0-based output dim). Row-major by i.
    val mdd = java.security.MessageDigest.getInstance("MD5")
    val signs = new Array[Byte](d * k)
    for (i <- 1 to d; j <- 0 until k) {
      val h = mdd.digest(s"${j}_${i}".getBytes("UTF-8"))
      signs((i - 1) * k + j) = if (((h(0) >> 4) & 0xf) <= 7) 1 else -1
      mdd.reset()
    }
    emb
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"),
        graft.functions.JlProjectF(col("embedding"), mn, mx, signs, k).as("rv"))
      .select(col("vec_id"), col("rv"), VectorFns.normSq(col("rv")).as("n2"))
  }

  /** The original explode→broadcast-join→aggregate formulation of
    * [[jlReducedVectors]] — retained as the independently-derived
    * reference the JlProjectF kernel is spec'd against (JlKernelSpec
    * pins row-for-row equality on real corpora). Not on any query
    * path.
    */
  private[graft] def jlReducedVectorsSql(emb: DataFrame, k: Int): DataFrame = {
    val ex = emb
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("v"))
    val st = ex.groupBy("i").agg(min("v").as("mn"), max("v").as("mx"))
    val codes = ex.join(broadcast(st), "i")
      .select(col("vec_id"), col("i"),
        (when(col("mx") === col("mn"), lit(0L))
          .otherwise(greatest(lit(0L), least(lit(255L),
            floor((col("v") - col("mn")) * lit(255.0) /
              (col("mx") - col("mn"))).cast("long"))))
          - lit(128L)).as("c"))
    val signs = st.select(col("i"))
      .crossJoin(emb.sparkSession.range(0, k).toDF("j"))
      .select(col("i"), col("j"),
        when(substring(md5(concat_ws("_", col("j"), col("i"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
    val red = codes.join(broadcast(signs), Seq("i"))
      .groupBy("vec_id", "j")
      .agg(sum(col("c") * col("sgn")).as("r"))
    red
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("r")))),
        x => x.getField("r").cast("double")).as("rv"))
      .select(col("vec_id"), col("rv"), VectorFns.normSq(col("rv")).as("n2"))
  }

  /** Exact reduced-space cosine for every vec pair (pre-top-k) over
    * [[jlReducedVectors]] — the DECLARED-SMALL-SCALE exact form
    * (enforced via [[LlmOps.MaxExactAllPairs]]): at 100 TB the reduced
    * vectors feed the q59 sign-LSH bucketing instead, and this is its
    * exact verifier. One double division per pair at the end.
    */
  def jlCosinePairs(
      emb: DataFrame, k: Int,
      maxExact: Long = LlmOps.MaxExactAllPairs): DataFrame = {
    LlmOps.requireSmallExact(
      emb.select("vec_id"), "jlCosinePairs", maxExact)
    val withN = jlReducedVectors(emb, k)
    // Pair via the q24_cosine_pairs shape: broadcast pair enumeration
    // feeding the codegen'd DotF fold — NOT an equi-join on j, whose
    // 16-key space would funnel the quadratic stage through 16 skewed
    // tasks.
    val a = withN.select(
      col("vec_id").as("vec_a"), col("rv").as("ra"), col("n2").as("na"))
    // limit = the cap requireSmallExact just proved, so it never
    // truncates; it stamps a provable bound on the broadcast side for
    // the registry-wide nested-loop guard (WindowGuardSpec). Clamped so
    // an override above Int.MaxValue degrades to a no-op, never wraps.
    val b = withN.select(
      col("vec_id").as("vec_b"), col("rv").as("rb"), col("n2").as("nb"))
      .limit(math.min(maxExact, Int.MaxValue.toLong).toInt)
    // The quadratic stage's parallelism comes from the STREAMED side's
    // partitioning — and a declared-small index is typically one scan
    // partition, which would funnel every pair through a single task
    // (measured: the whole q56 cost). An explicit repartition (exempt
    // from AQE coalescing, unlike a keyless exchange it might shrink
    // back to one partition) spreads the n²/2 enumeration across the
    // session's cores; the shuffle moves only the ≤ maxExact reduced
    // rows. The dot is computed ONCE per pair and reused by both
    // output columns (it was previously two independent DotF calls).
    val parts = math.max(1, emb.sparkSession.sparkContext.defaultParallelism)
    a.repartition(parts)
      .join(broadcast(b), col("vec_a") < col("vec_b"))
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("d", VectorFns.dot(col("ra"), col("rb")))
      .select(col("vec_a"), col("vec_b"),
        col("d").cast("long").as("dot_red"),
        round(col("d") / (sqrt(col("na")) * sqrt(col("nb"))), 6).as("cosine_red"))
  }

  /** The stored JL index: [[jlReducedVectors]] with zero-norm rows
    * dropped, MATERIALIZED (eager localCheckpoint) — at 100 TB this
    * table is index-build output written next to the corpus (kDims ints
    * per vector, a 16x scan cut vs the raw 64-dim floats), and serving
    * reads it several ways (LSH buckets, query probes, recall ground
    * truth) without recomputing the projection subtree per reference.
    */
  def jlReducedIndex(emb: DataFrame, kDims: Int): DataFrame =
    jlReducedVectors(emb, kDims)
      .filter(col("n2") > 0)
      .localCheckpoint(true)

  /** The scale path the JL projection exists FOR (the promise recorded
    * at the q56 pair stage, now a query): project 64 → kDims dims
    * first, then serve top-k through the multi-table multiprobe
    * sign-LSH bucketing ([[LlmOps.signLshTopK]]) over the REDUCED
    * vectors of a [[jlReducedIndex]].
    */
  def jlAnnTopK(red: DataFrame, k: Int): DataFrame =
    LlmOps.signLshTopK(red.select("vec_id", "rv"), "rv", k)
}
