package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 pipeline/analytics additions: event funnels, fuzzy string
  * joins, LM quality scoring, data-quality constraint suites, graph
  * analytics (PageRank, triangles), incremental view maintenance,
  * train/val/test splitting, robust outlier detection, positional
  * phrase search, and interval-join session attribution.
  *
  * These extend the declared inventory beyond the reference's conversion
  * surface (the reference computes none of these — it is a one-pass
  * xlsx/xlsb→parquet converter, `/root/reference/src/lib.rs:30-102`) with
  * the operations a production training-data/analytics pipeline runs on
  * the converted lake. Every query keeps the repo-wide determinism rules
  * (explicit ORDER BY, decimal sums for money, BIGINT casts) so the
  * DuckDB hash oracle stays exact.
  */
object Insights {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------------ funnel
  // Ordered-event funnel over the events table: how many users did
  // view → click → purchase IN THAT ORDER (each later stage strictly
  // after the user's earliest completion of the previous stage).
  //
  // Shape: three stage passes, each a filter + per-user min-timestamp
  // aggregation joined against the previous stage's frontier. The
  // frontier tables are per-user aggregates — orders of magnitude
  // smaller than the event log — but still user-cardinality, so the
  // frontier join is deliberately UNHINTED: AQE broadcasts it when it
  // is actually small and falls back to a shuffle join keyed by
  // user_id when it isn't (a billion-user frontier must not be forced
  // through a broadcast). State never exceeds one row per qualifying
  // user per stage. This is the standard scalable funnel shape: no
  // per-user event collection, no window over the whole log.
  private def funnelQ: QueryDef = QueryDef(
    "q35_funnel",
    (s, dir) => {
      val e = t(s, dir, "events").select("user_id", "event_type", "ts")
      def stage(prev: DataFrame, prevTs: String, ev: String, outTs: String) =
        e.filter(col("event_type") === ev)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevTs))
          .groupBy("user_id").agg(min("ts").as(outTs))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = stage(v, "t1", "click", "t2")
      val p = stage(c, "t2", "purchase", "t3")
      v.agg(count(lit(1)).as("n_view_users")).crossJoin(
        c.agg(count(lit(1)).as("n_click_users"))).crossJoin(
        p.agg(count(lit(1)).as("n_purchase_users")))
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           |           WHERE event_type = 'view' GROUP BY 1),
           |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
           |      WHERE e.event_type = 'click' GROUP BY 1),
           |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
           |      WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT (SELECT count(*) FROM v) AS n_view_users,
           |       (SELECT count(*) FROM c) AS n_click_users,
           |       (SELECT count(*) FROM p) AS n_purchase_users""".stripMargin))

  // -------------------------------------------- edit-distance similarity join
  // Fuzzy self-join of the part-name vocabulary: all word pairs within
  // Levenshtein distance 2, found WITHOUT the quadratic cross join.
  //
  // Blocking is the deletion neighborhood: every word emits all variants
  // reachable by deleting ≤ 2 characters; two words within edit
  // distance 2 always share a variant (delete the aligned edit
  // positions from both sides of any optimal 2-op alignment), so
  // joining on the variant key is a COMPLETE candidate generator and
  // the exact levenshtein filter only runs on candidates. At corpus
  // scale the candidate count is bounded by the vocabulary (each word
  // makes O(L²) variants), not by vocab² — the cross join the oracle
  // runs below would be infeasible at a real vocabulary size.
  private def editJoinQ: QueryDef = QueryDef(
    "q35_edit_join",
    (s, dir) => {
      import s.implicits._
      val words = t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("w"))
        .distinct().as[String]
      graft.operators.FuzzyJoin.pairsWithin(words, 2)
        .orderBy("w1", "w2")
    },
    Some("""WITH w AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w
           |           FROM part)
           |SELECT a.w AS w1, b.w AS w2,
           |       CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
           |FROM w a JOIN w b ON a.w < b.w
           |WHERE levenshtein(a.w, b.w) <= 2
           |ORDER BY w1, w2""".stripMargin),
    bench = true)

  // ------------------------------------------------- data-quality suite
  // Deequ-style constraint validation over the lake: each constraint
  // yields (check_name, metric, passed). The five lineitem constraints
  // compute in ONE aggregation pass (conditional aggregates over a
  // single scan — at 100 TB this is the only affordable shape; one
  // scan, k metrics); uniqueness folds into the same pass as
  // count(*) - count(distinct key); the FK check is an anti join
  // against the referenced dimension (unhinted — AQE broadcasts a
  // small dimension, shuffles a big one). Everything stays
  // distributed — no driver-side metric collection.
  private def qualityQ: QueryDef = QueryDef(
    "q37_quality_suite",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      def row(name: String, metric: Column, passed: Column): Column =
        struct(lit(name).as("check_name"),
          metric.cast("double").as("metric"), passed.as("passed"))
      val one = l.agg(
        count(lit(1)).as("n"),
        count(col("l_shipdate")).as("n_shipdate"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_key"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L))
          .as("n_qty_bad"),
        sum(when(!col("l_returnflag").isin("R", "A", "N"), 1L).otherwise(0L))
          .as("n_flag_bad"))
      val orphans = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      one.crossJoin(orphans)
        .select(explode(array(
          row("shipdate_completeness",
            col("n_shipdate").cast("double") / col("n").cast("double"),
            col("n_shipdate") === col("n")),
          row("lineitem_rowcount", col("n"), col("n") > 0),
          row("orders_custkey_fk", col("n_orphan"), col("n_orphan") === 0),
          row("orderkey_linenumber_unique", col("n") - col("n_key"),
            col("n") === col("n_key")),
          row("quantity_range", col("n_qty_bad"), col("n_qty_bad") === 0),
          row("returnflag_domain", col("n_flag_bad"), col("n_flag_bad") === 0)
        )).as("c"))
        .select(col("c.check_name"), col("c.metric"), col("c.passed"))
        .orderBy("check_name")
    },
    Some("""WITH m AS (SELECT count(*) AS n, count(l_shipdate) AS n_shipdate,
           |  count(DISTINCT (l_orderkey, l_linenumber)) AS n_key,
           |  sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS n_qty_bad,
           |  sum(CASE WHEN l_returnflag NOT IN ('R','A','N') THEN 1 ELSE 0 END) AS n_flag_bad
           |  FROM lineitem),
           |o AS (SELECT count(*) AS n_orphan FROM orders
           |      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
           |SELECT check_name, metric, passed FROM (
           |  SELECT 'shipdate_completeness' AS check_name,
           |         CAST(n_shipdate AS DOUBLE)/CAST(n AS DOUBLE) AS metric,
           |         n_shipdate = n AS passed FROM m
           |  UNION ALL SELECT 'lineitem_rowcount', CAST(n AS DOUBLE), n > 0 FROM m
           |  UNION ALL SELECT 'orders_custkey_fk', CAST(n_orphan AS DOUBLE),
           |         n_orphan = 0 FROM o
           |  UNION ALL SELECT 'orderkey_linenumber_unique',
           |         CAST(n - n_key AS DOUBLE), n = n_key FROM m
           |  UNION ALL SELECT 'quantity_range', CAST(n_qty_bad AS DOUBLE),
           |         n_qty_bad = 0 FROM m
           |  UNION ALL SELECT 'returnflag_domain', CAST(n_flag_bad AS DOUBLE),
           |         n_flag_bad = 0 FROM m)
           |ORDER BY check_name""".stripMargin))

  // --------------------------------------------------- PageRank (trade graph)
  // PageRank over the nation trade graph: an edge src→dst with weight =
  // number of lineitems a supplier in nation src shipped to a customer
  // in nation dst. Damping 0.85, 3 fixed iterations from the uniform
  // vector (fixed iteration count keeps the oracle expressible as
  // nested SQL CTEs and the result deterministic).
  //
  // The iterative step is the standard DataFrame PageRank: join the
  // out-normalized edge list with the current rank vector on src,
  // aggregate inflow by dst, rebuild the vector with the damping term.
  // Dangling nodes (nations with no outgoing trade — real at small SF,
  // where few nations have suppliers) donate their rank uniformly each
  // iteration, so total mass stays exactly 1. Here the graph is 25
  // nodes so every join broadcasts; at web scale the SAME plan shape
  // hash-partitions edges by src and ranks by key, and each iteration
  // is one shuffle plus a scalar dangling-mass aggregate — the
  // textbook distributed PageRank. Edge building is the heavy part
  // (4-way fact/dim join) and happens once, outside the loop, through
  // localCheckpoint so the loop doesn't re-derive lineage each
  // iteration.
  /** Directed nation trade graph: src = supplier nation, dst = customer
    * nation, w = lineitem count. The heavy 4-way fact/dim join behind
    * both graph queries (PageRank, triangles).
    */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))

  /** Shared SQL for the same edge derivation (oracle side). */
  private val duckTradeEdges =
    """SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
      |         CAST(count(*) AS DOUBLE) AS w
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2""".stripMargin

  private def pagerankQ: QueryDef = QueryDef(
    "q38_pagerank",
    (s, dir) => {
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").as("k"), col("n_name"))
      val nNations = 25.0 // TPC-H nation is a fixed 25-row table
      val edges = tradeEdges(s, dir)
      val en = edges
        .withColumn("wn", col("w") /
          sum(col("w")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .select("src", "dst", "wn")
        .localCheckpoint(true)
      val srcs = en.select("src").distinct()
      var pr = nation.select(col("k"), lit(1.0 / nNations).as("pr"))
      for (_ <- 1 to 3) {
        val inflow = en.join(pr, col("src") === col("k"))
          .groupBy("dst").agg(sum(col("wn") * col("pr")).as("inflow"))
        val dangling = pr
          .join(srcs, col("k") === col("src"), "left_anti")
          .agg(coalesce(sum("pr"), lit(0.0)).as("d"))
        pr = nation.select(col("k"))
          .join(inflow, col("k") === col("dst"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("k"),
            (lit(0.15 / nNations) + lit(0.85) *
              (coalesce(col("inflow"), lit(0.0)) +
                col("d") / lit(nNations))).as("pr"))
      }
      pr.join(broadcast(nation), "k")
        .select(col("n_name"), round(col("pr"), 6).as("pagerank"))
        .orderBy("n_name")
    },
    Some(s"""WITH e AS (
           |  $duckTradeEdges),
           |en AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS wn
           |       FROM e),
           |srcs AS (SELECT DISTINCT src FROM en),
           |p0 AS (SELECT n_nationkey AS k, 1.0/25 AS pr FROM nation),
           |d0 AS (SELECT coalesce(sum(pr), 0) AS d FROM p0
           |       WHERE k NOT IN (SELECT src FROM srcs)),
           |p1 AS (SELECT n.n_nationkey AS k,
           |         0.15/25 + 0.85*(coalesce(sum(en.wn * p0.pr), 0)
           |           + (SELECT d FROM d0)/25) AS pr
           |       FROM nation n
           |       LEFT JOIN en ON en.dst = n.n_nationkey
           |       LEFT JOIN p0 ON p0.k = en.src GROUP BY 1),
           |d1 AS (SELECT coalesce(sum(pr), 0) AS d FROM p1
           |       WHERE k NOT IN (SELECT src FROM srcs)),
           |p2 AS (SELECT n.n_nationkey AS k,
           |         0.15/25 + 0.85*(coalesce(sum(en.wn * p1.pr), 0)
           |           + (SELECT d FROM d1)/25) AS pr
           |       FROM nation n
           |       LEFT JOIN en ON en.dst = n.n_nationkey
           |       LEFT JOIN p1 ON p1.k = en.src GROUP BY 1),
           |d2 AS (SELECT coalesce(sum(pr), 0) AS d FROM p2
           |       WHERE k NOT IN (SELECT src FROM srcs)),
           |p3 AS (SELECT n.n_nationkey AS k,
           |         0.15/25 + 0.85*(coalesce(sum(en.wn * p2.pr), 0)
           |           + (SELECT d FROM d2)/25) AS pr
           |       FROM nation n
           |       LEFT JOIN en ON en.dst = n.n_nationkey
           |       LEFT JOIN p2 ON p2.k = en.src GROUP BY 1)
           |SELECT n.n_name, round(p3.pr, 6) AS pagerank
           |FROM p3 JOIN nation n ON n.n_nationkey = p3.k
           |ORDER BY n.n_name""".stripMargin),
    bench = true)

  // ----------------------------------------------- triangle counting
  // Undirected triangle count on the nation trade graph — the standard
  // distributed graph benchmark shape: orient every edge low→high
  // (each triangle counted exactly once, no permutation dedup), build
  // wedges by joining oriented edges head-to-tail, and close them with
  // a third join back to the edge set. Three hash joins keyed by
  // node id — at web scale this hash-partitions edges by the join key
  // each round and never materializes neighborhoods in memory (the
  // adjacency-list formulation would OOM on high-degree hub nodes;
  // the join formulation just shuffles more rows for them).
  private def trianglesQ: QueryDef = QueryDef(
    "q38_triangles",
    (s, dir) => {
      val u = tradeEdges(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val wedges = u.as("e1").join(u.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      val tri = wedges.join(u.as("e3"),
          col("x") === col("e3.a") && col("z") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
      u.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
    },
    Some(s"""WITH e AS (
           |  $duckTradeEdges),
           |u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |      FROM e WHERE src <> dst)
           |SELECT (SELECT count(*) FROM u) AS n_edges,
           |       (SELECT count(*)
           |        FROM u e1
           |        JOIN u e2 ON e2.a = e1.b
           |        JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin))

  // ------------------------------------------- train/val/test splitting
  // Deterministic 80/10/10 split by hash bucket: md5(doc_id) mod 100
  // assigns each document a stable bucket, so the split is reproducible
  // across runs, machines, and engine versions, independent of row
  // order and partitioning, and any document's assignment can be
  // recomputed in O(1) — the properties a random() split lacks and a
  // training pipeline needs (no leakage when the corpus is re-ingested
  // or appended: old docs never change split). Pure map + one
  // aggregate; no shuffle before the final group-by.
  private def splitQ: QueryDef = QueryDef(
    "q28_train_split",
    (s, dir) => {
      // bucket from the first 4 hex chars (0..65535) mod 100: the ~0.1%
      // mod bias is irrelevant for a split and the arithmetic is
      // portable (DuckDB has no hex→int cast, so the oracle rebuilds
      // the value digit-by-digit via strpos)
      val bucket =
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("lang", "split")
    },
    Some("""WITH b AS (
           |  SELECT lang, doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           |    ((strpos('0123456789abcdef',
           |        substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
           |     (strpos('0123456789abcdef',
           |        substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
           |     (strpos('0123456789abcdef',
           |        substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
           |     (strpos('0123456789abcdef',
           |        substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100
           |      AS bucket
           |  FROM documents)
           |SELECT lang,
           |  CASE WHEN bucket < 80 THEN 'train'
           |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           |  count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
           |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ------------------------------------------------ robust outlier counts
  // Per-event-type anomaly detection with the robust z-score: median and
  // MAD (median absolute deviation) instead of mean/stddev, so the
  // detector itself isn't dragged by the outliers it hunts. Exact
  // medians via percentile(); med/MAD are rounded to 4 decimals BEFORE
  // the threshold comparison so the Spark and DuckDB float paths see an
  // identical cutoff. Two aggregation passes over events (med, then MAD
  // + count) — at scale each is one shuffle keyed by event_type, with
  // the 5-row med/MAD tables broadcast back. For a 100 TB log the exact
  // percentile would swap to approx_percentile (declared tolerance), as
  // q29_percentiles already demonstrates; the robust-score shape is
  // identical.
  private def outliersQ: QueryDef = QueryDef(
    "q40_outliers",
    (s, dir) => {
      val e = t(s, dir, "events").select("event_type", "value")
      val med = e.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(round(expr("percentile(adev, 0.5)"), 4).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(first("med").as("med"), first("mad").as("mad"),
          sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (SELECT event_type,
           |    round(quantile_cont(value, 0.5), 4) AS med
           |  FROM events GROUP BY 1),
           |dev AS (SELECT e.event_type, e.value, med.med,
           |    abs(e.value - med.med) AS adev
           |  FROM events e JOIN med ON e.event_type = med.event_type),
           |mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 4) AS mad
           |  FROM dev GROUP BY 1)
           |SELECT dev.event_type, any_value(dev.med) AS med,
           |       any_value(mad.mad) AS mad,
           |       CAST(sum(CASE WHEN dev.adev > 3.0 * 1.4826 * mad.mad
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
           |FROM dev JOIN mad ON dev.event_type = mad.event_type
           |GROUP BY dev.event_type
           |ORDER BY dev.event_type""".stripMargin))

  // ------------------------------------------------ positional phrase search
  // Exact phrase search ("table value") through a positional inverted
  // index: posexplode the token stream into (doc_id, pos, token)
  // postings, take the postings lists of the two phrase words, and join
  // on (doc_id, consecutive positions). This is the IR-engine phrase
  // shape: work is proportional to the two terms' posting lists, not to
  // the corpus, and the adjacency join hash-partitions by doc_id. A
  // k-word phrase chains k-1 such joins, cheapest-list first.
  private def phraseQ: QueryDef = QueryDef(
    "q41_phrase_search",
    (s, dir) => {
      val (w1, w2) = ("table", "value")
      val post = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val p1 = post.filter(col("tok") === w1).select("doc_id", "pos")
      val p2 = post.filter(col("tok") === w2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      p1.join(p2, Seq("doc_id", "pos"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
           |            FROM documents)
           |SELECT doc_id,
           |  CAST(len(list_filter(range(1, len(w)),
           |       i -> w[i] = 'table' AND w[i+1] = 'value')) AS BIGINT)
           |    AS n_matches
           |FROM tok
           |WHERE len(list_filter(range(1, len(w)),
           |      i -> w[i] = 'table' AND w[i+1] = 'value')) > 0
           |ORDER BY doc_id""".stripMargin))

  // --------------------------------------- incremental view maintenance
  // Classic incremental materialized-view maintenance: a daily-revenue
  // MV is built from the orders "history" (before the split date) and
  // persisted; a "new batch" (the rest) arrives and is folded in by
  // merging PARTIAL aggregates — union the stored MV rows with the
  // delta's partial aggregate and re-aggregate on the key. Cost is
  // O(delta + touched MV rows), never a recompute of the full fact
  // table — at 100 TB that is the difference between a nightly job
  // that scans 100 TB and one that scans the day's arrivals. Sums ride
  // DECIMAL so partial/merge order can't change a cent. The oracle is
  // the from-scratch aggregation — incremental maintenance must be
  // indistinguishable from recompute.
  private def incrementalAggQ: QueryDef = QueryDef(
    "q39_incremental_agg",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val split = lit("1997-06-01").cast("timestamp")
      val orders = t(s, dir, "orders")
        .select(col("o_orderdate"), col("o_totalprice"))
      def partial(df: DataFrame): DataFrame =
        df.groupBy(to_date(col("o_orderdate")).as("order_day"))
          .agg(sum(col("o_totalprice").cast(DecimalType(38, 2))).as("rev"),
            count(lit(1)).as("n_orders"))
      // the stored MV (history partials) is deterministic per sf dir —
      // build it once, atomically published; each run folds in only the
      // delta, which is the whole point of incremental maintenance
      val mvPath = graft.RunPaths.sharedFixture(
        s"graft_q39_mv_${graft.RunPaths.keyFor(dir)}.parquet") { tmpOut =>
        partial(orders.filter(col("o_orderdate") < split))
          .write.mode("overwrite").parquet(tmpOut)
      }
      val delta = partial(orders.filter(col("o_orderdate") >= split))
      s.read.parquet(mvPath).unionByName(delta)
        .groupBy("order_day")
        .agg(sum("rev").cast("double").as("revenue"),
          sum("n_orders").as("n_orders"))
        .orderBy("order_day")
    },
    Some("""SELECT CAST(o_orderdate AS DATE) AS order_day,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
           |    AS revenue,
           |  count(*) AS n_orders
           |FROM orders
           |GROUP BY 1
           |ORDER BY 1""".stripMargin))

  // ------------------------------------------- bigram LM quality score
  // Language-model-based corpus filtering: train an add-one-smoothed
  // bigram model on the whole corpus, then score every document by its
  // mean log-probability — the cheap statistical stand-in for the
  // perplexity filters real pretraining pipelines run (low scores =
  // unnatural token sequences = filter candidates).
  //
  // Two passes: (1) corpus-wide bigram/context counts — one shuffle
  // keyed by the bigram; (2) re-scan, explode each document's bigrams,
  // join against the model, average per doc. The model tables are
  // vocabulary-sized (<< corpus) so the scoring join broadcasts; at a
  // real vocabulary it becomes a hash join keyed by bigram — either
  // way the corpus is scanned exactly twice and nothing is collected.
  private def lmScoreQ: QueryDef = QueryDef(
    "q36_lm_score",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val bg = toks.select(col("doc_id"),
          explode(expr(
            "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS a, w[i + 1] AS b))"))
            .as("p"))
        .select(col("doc_id"), col("p.a"), col("p.b"))
      val cAb = bg.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val cA = bg.groupBy("a").agg(count(lit(1)).as("c_a"))
      val v = bg.select(col("b").as("tok")).union(bg.select(col("a")))
        .agg(countDistinct("tok").as("vocab"))
      bg.join(cAb, Seq("a", "b"))
        .join(cA, Seq("a"))
        .crossJoin(broadcast(v))
        .withColumn("lp",
          log((col("c_ab") + lit(1.0)) / (col("c_a") + col("vocab"))))
        .groupBy("doc_id")
        .agg(round(avg("lp"), 6).as("lm_score"),
          count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
           |            FROM documents),
           |bg AS (SELECT doc_id,
           |         unnest(list_transform(range(2, len(w) + 1),
           |           i -> [w[i-1], w[i]])) AS p
           |       FROM tok),
           |b AS (SELECT doc_id, p[1] AS a, p[2] AS b FROM bg),
           |c_ab AS (SELECT a, b, count(*) AS c_ab FROM b GROUP BY 1, 2),
           |c_a AS (SELECT a, count(*) AS c_a FROM b GROUP BY 1),
           |v AS (SELECT count(DISTINCT tok) AS vocab FROM
           |      (SELECT b AS tok FROM b UNION ALL SELECT a FROM b))
           |SELECT b.doc_id,
           |  round(avg(ln((c_ab.c_ab + 1.0) / (c_a.c_a + v.vocab))), 6)
           |    AS lm_score,
           |  count(*) AS n_bigrams
           |FROM b
           |JOIN c_ab ON b.a = c_ab.a AND b.b = c_ab.b
           |JOIN c_a ON b.a = c_a.a
           |CROSS JOIN v
           |GROUP BY b.doc_id
           |ORDER BY b.doc_id""".stripMargin))

  // --------------------------------------------- session attribution
  // Composition showcase: attribute every purchase event to the user
  // session (q34's 30-minute-gap definition) containing it, through the
  // custom PointInIntervalJoinExec — sessions become [first_ts,
  // last_ts + 1µs) intervals keyed by user, purchases are the probe
  // points. Same session derivation as q34 (one exchange + window), then
  // the operator's per-key binary-search probe instead of a nested
  // loop. The build side (sessions) broadcasts here; at 100 TB the
  // plain BETWEEN phrasing of the same join goes through
  // plans.RangeJoinRule's bucketed rewrite instead — both surfaces are
  // exercised in the suite.
  private def sessionAttributionQ: QueryDef = QueryDef(
    "q34_session_attribution",
    (s0, dir) => {
      val s = s0.newSession()
      graft.plans.IntervalJoin.install(s)
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sessions = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(w))
        .groupBy(col("user_id").as("s_user"), col("session_id"))
        .agg(min(col("ts")).as("lo"),
          expr("timestamp_micros(unix_micros(max(ts)) + 1)").as("hi"))
      val purchases = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.plans.IntervalJoin
        .pointInInterval(purchases, sessions, "ts", "lo", "hi",
          probeKeys = Seq("user_id"), buildKeys = Seq("s_user"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(27, 6))).cast("double")
            .as("purchase_value"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH ordered AS (
           |  SELECT user_id, ts, event_id,
           |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
           |           ORDER BY ts, event_id) AS prev_us
           |  FROM events),
           |flags AS (
           |  SELECT user_id, ts, event_id,
           |         CASE WHEN prev_us IS NULL
           |              OR epoch_us(ts) - prev_us > 1800000000
           |           THEN 1 ELSE 0 END AS new_sess
           |  FROM ordered),
           |sess AS (
           |  SELECT user_id, ts,
           |         CAST(sum(new_sess) OVER (PARTITION BY user_id
           |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
           |           AS BIGINT) AS session_id
           |  FROM flags),
           |ivl AS (SELECT user_id, session_id, min(ts) AS lo, max(ts) AS hi
           |        FROM sess GROUP BY 1, 2),
           |pur AS (SELECT user_id, ts, value FROM events
           |        WHERE event_type = 'purchase')
           |SELECT p.user_id, i.session_id,
           |       count(*) AS n_purchases,
           |       CAST(sum(CAST(p.value AS DECIMAL(27,6))) AS DOUBLE)
           |         AS purchase_value
           |FROM pur p JOIN ivl i
           |  ON p.user_id = i.user_id AND i.lo <= p.ts AND p.ts <= i.hi
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    funnelQ, editJoinQ, lmScoreQ, qualityQ, pagerankQ, incrementalAggQ,
    trianglesQ, splitQ, outliersQ, phraseQ, sessionAttributionQ)
}
