package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-2 analytics surface: pivot/unpivot, deterministic sampling,
  * moment statistics / correlation / percentiles, partitioned and
  * bucketed storage layouts, extended window functions, conditional /
  * null-handling functions, and CSV/JSON source round-trips.
  *
  * Determinism follows the QueryDef contract: decimal-cast sums for
  * order-independence, explicit ORDER BY on unique key prefixes, and
  * content-hash (md5) sampling instead of RNG sampling so both engines
  * select identical rows.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  // Per-run scratch: concurrent runs on one host must not share output
  // paths (spurious failures / cross-run clobbering).
  private def tmp(name: String): String = graft.RunPaths.scratch(name)

  // True iff the exception chain is Spark's malformed-record FAILFAST
  // error (MALFORMED_RECORD_IN_PARSING / "Malformed records" message) —
  // the q32 probes must not count an unrelated failure (bad path, OOM,
  // analysis error) as the FAILFAST contract holding.
  private def malformedCause(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists { c =>
      val m = Option(c.getMessage).getOrElse("")
      m.contains("MALFORMED_RECORD_IN_PARSING") || m.contains("Malformed")
    }

  val all: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------- pivot
    // Explicit pivot values keep the plan a single pass (no extra
    // distinct-values job) and make the output schema static — which is
    // also what you want at 100 TB (a pivot over unknown cardinality is
    // a driver-side OOM waiting to happen).
    QueryDef(
      "q27_pivot",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(dsum(col("l_quantity"), 2))
          .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,2)) END) AS DOUBLE) AS qty_f,
             |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,2)) END) AS DOUBLE) AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // --------------------------------------------------------- unpivot
    QueryDef(
      "q27_unpivot",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            col("o_totalprice"), col("o_custkey").cast("double").as("o_custkey_d"))
          .unpivot(
            Array(col("o_orderkey")),
            Array(col("o_totalprice"), col("o_custkey_d")),
            "metric", "value")
          .orderBy("o_orderkey", "metric"),
      Some("""SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
             |UNION ALL
             |SELECT o_orderkey, 'o_custkey_d' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
             |ORDER BY o_orderkey, metric""".stripMargin)),

    // --------------------------------------- deterministic hash sampling
    // Content-hash Bernoulli sampling (~1/16 via the first md5 nibble):
    // unlike rand()-based TABLESAMPLE it is reproducible across engines,
    // partitionings and retries — the property that matters when a 100 TB
    // sample feeds a training-data audit that must be re-runnable.
    QueryDef(
      "q28_sample_hash",
      (s, dir) =>
        t(s, dir, "orders")
          .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
          .agg(
            count(lit(1)).as("n_sampled"),
            dsum(col("o_totalprice"), 2).as("sample_total"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key")),
      Some("""SELECT count(*) AS n_sampled,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sample_total,
             |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
             |FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'""".stripMargin)),

    // ------------------------------------ stratified top-n-per-stratum
    // Deterministic stratified sample: n rows per stratum chosen by md5
    // rank (uniform within stratum, reproducible). The window ranks
    // within each stratum only — shuffle is by stratum key, no global
    // sort, so it scales to arbitrary table sizes.
    QueryDef(
      "q28_sample_stratified",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_sampled"),
            dsum(col("o_totalprice"), 2).as("sample_total"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH ranked AS (
             |  SELECT o_orderpriority, o_totalprice,
             |         row_number() OVER (PARTITION BY o_orderpriority
             |           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
             |  FROM orders)
             |SELECT o_orderpriority, count(*) AS n_sampled,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sample_total
             |FROM ranked WHERE rn <= 20
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------ training-mixture resampling
    // Domain-mixture construction: cap each language's contribution at a
    // per-domain budget (here en=1200, de/fr=400, others=150), choosing
    // survivors by md5 rank — deterministic, uniform within domain, and
    // reproducible across runs. Selection runs through
    // operators/QuotaSelect: the md5 hex prefix buckets each language
    // into 256 order-consistent sub-ranges, whole buckets keep or drop
    // by a broadcast cumulative-count table, and ONLY the boundary
    // bucket (~1/256 of the group) is ranked — no whole-language sort
    // anywhere, so the dominant language of a real corpus is never a
    // one-task window. The DuckDB oracle keeps the single-window
    // formulation: the cross-engine match IS the equivalence proof.
    // The same shape with per-epoch salts in the hash gives epoch-wise
    // resampling without materializing permutations.
    QueryDef(
      "q28_mixture",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .withColumn("k", md5(col("doc_id").cast("string")))
        val quotas = d.select(col("lang")).distinct()
          .withColumn("quota",
            when(col("lang") === "en", 1200L)
              .when(col("lang").isin("de", "fr"), 400L)
              .otherwise(150L))
        graft.operators.QuotaSelect.select(d, "lang", "k", "doc_id", quotas)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("mix_tokens"),
            min(col("doc_id")).as("min_doc"))
          .orderBy("lang")
      },
      Some("""WITH ranked AS (
             |  SELECT lang, doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |         row_number() OVER (PARTITION BY lang
             |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS mix_tokens,
             |  min(doc_id) AS min_doc
             |FROM ranked
             |WHERE rn <= CASE WHEN lang = 'en' THEN 1200
             |                 WHEN lang IN ('de', 'fr') THEN 400
             |                 ELSE 150 END
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ------------------------------- temperature-weighted mixture
    // The multilingual sampling rule (mT5/XLM-R style): per-language
    // quota ∝ n_lang^α with α = 0.5, normalized to a 2000-doc budget —
    // low-resource languages get upsampled relative to their share,
    // high-resource ones capped. Quotas derive from one tiny aggregate
    // (languages × 1 rows, broadcast); selection reuses q28_mixture's
    // deterministic md5 ranking, so any doc's membership is O(1)
    // recomputable and append-stable. A quota above a language's doc
    // count degrades to keep-all (sampling WITH replacement is an
    // epoch-time concern, not a corpus-prep one).
    QueryDef(
      "q28_temperature_mix",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val counts = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        // z as an exact decimal sum of 6-decimal-rounded sqrt terms:
        // sqrt is correctly rounded (IEEE), so each term is
        // bit-identical in both engines, and the decimal sum is
        // order-independent — the quota integers can never drift.
        val quotas = counts
          .crossJoin(broadcast(
            counts.agg(sum(round(sqrt(col("n_lang")), 6)
              .cast("decimal(20,6)")).cast("double").as("z"))))
          .select(col("lang"),
            round(lit(2000.0) * sqrt(col("n_lang")) / col("z"))
              .cast("long").as("quota"))
        // selection via QuotaSelect (boundary-bucket ranking only — see
        // q28_mixture); the oracle stays the whole-window formulation
        graft.operators.QuotaSelect
          .select(d.withColumn("k", md5(col("doc_id").cast("string"))),
            "lang", "k", "doc_id", quotas)
          .join(broadcast(quotas), Seq("lang"))
          .groupBy(col("lang"))
          .agg(max(col("quota")).as("quota"),
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("mix_tokens"))
          .orderBy("lang")
      },
      Some("""WITH c AS (
             |  SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
             |q AS (
             |  SELECT lang,
             |    CAST(round(2000.0 * sqrt(n_lang) /
             |               (SELECT CAST(sum(CAST(round(sqrt(n_lang), 6)
             |                                     AS DECIMAL(20,6)))
             |                            AS DOUBLE) FROM c)) AS BIGINT)
             |      AS quota
             |  FROM c),
             |ranked AS (
             |  SELECT lang, doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |         row_number() OVER (PARTITION BY lang
             |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |SELECT r.lang, max(q.quota) AS quota, count(*) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS mix_tokens
             |FROM ranked r JOIN q ON r.lang = q.lang
             |WHERE r.rn <= q.quota
             |GROUP BY r.lang ORDER BY r.lang""".stripMargin)),

    // ------------------------------------------- moment statistics
    // Mean/variance/stddev/skewness from exact decimal power sums: the
    // double->decimal cast of each term rounds identically in both
    // engines, and decimal accumulation is order-independent, so the
    // derived doubles are bit-deterministic. One partial-aggregated pass
    // (map-side combine), no second pass over the data.
    QueryDef(
      "q29_summary_stats",
      (s, dir) => {
        val x = col("l_quantity")
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(x.cast(DecimalType(38, 2))).as("s1"),
            sum((x * x).cast(DecimalType(38, 4))).as("s2"),
            sum((x * x * x).cast(DecimalType(38, 6))).as("s3"))
          .select(
            col("l_returnflag"), col("n_rows"),
            round(col("s1").cast("double") / col("n_rows"), 6).as("mean_qty"),
            round(col("s2").cast("double") / col("n_rows") -
              pow(col("s1").cast("double") / col("n_rows"), 2), 6).as("var_qty"),
            round(
              (col("s3").cast("double") / col("n_rows") -
                lit(3.0) * (col("s1").cast("double") / col("n_rows")) * (col("s2").cast("double") / col("n_rows")) +
                lit(2.0) * pow(col("s1").cast("double") / col("n_rows"), 3)) /
              pow(col("s2").cast("double") / col("n_rows") -
                pow(col("s1").cast("double") / col("n_rows"), 2), 1.5), 6).as("skew_qty"))
          .orderBy("l_returnflag")
      },
      Some("""WITH sums AS (
             |  SELECT l_returnflag, count(*) AS n_rows,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS s1,
             |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s2,
             |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n_rows,
             |  round(s1 / n_rows, 6) AS mean_qty,
             |  round(s2 / n_rows - (s1 / n_rows) ^ 2, 6) AS var_qty,
             |  round((s3 / n_rows - 3.0 * (s1 / n_rows) * (s2 / n_rows) + 2.0 * (s1 / n_rows) ^ 3) /
             |        ((s2 / n_rows - (s1 / n_rows) ^ 2) ^ 1.5), 6) AS skew_qty
             |FROM sums ORDER BY l_returnflag""".stripMargin)),

    // ------------------------------------------------- correlation
    QueryDef(
      "q29_corr",
      (s, dir) => {
        val x = col("l_quantity"); val y = col("l_extendedprice")
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(x.cast(DecimalType(38, 2))).cast("double").as("sx"),
            sum(y.cast(DecimalType(38, 2))).cast("double").as("sy"),
            sum((x * x).cast(DecimalType(38, 4))).cast("double").as("sxx"),
            sum((y * y).cast(DecimalType(38, 4))).cast("double").as("syy"),
            sum((x * y).cast(DecimalType(38, 4))).cast("double").as("sxy"))
          .select(col("l_returnflag"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
               sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH sums AS (
             |  SELECT l_returnflag,
             |    CAST(count(*) AS DOUBLE) AS n,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sx,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sy,
             |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
             |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy,
             |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |  round((n * sxy - sx * sy) /
             |        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
             |FROM sums ORDER BY l_returnflag""".stripMargin)),

    // ------------------------------------------------- percentiles
    // Exact linear-interpolation percentiles (Spark `percentile` ==
    // DuckDB `quantile_cont`), plus the approx-sketch contract: the
    // t-digest estimate must land within 5% of the exact median.
    QueryDef(
      "q29_percentiles",
      (s, dir) => {
        val pct = expr("percentile(l_quantity, array(0.25, 0.5, 0.75))")
        val apx = expr("approx_percentile(l_quantity, 0.5, 10000)")
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(pct.as("pct"), apx.as("apx"))
          .select(col("l_returnflag"),
            round(element_at(col("pct"), 1), 6).as("p25"),
            round(element_at(col("pct"), 2), 6).as("p50"),
            round(element_at(col("pct"), 3), 6).as("p75"),
            (abs(col("apx") - element_at(col("pct"), 2)) <=
              element_at(col("pct"), 2) * 0.05).as("approx_ok"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
             |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
             |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
             |  true AS approx_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ----------------------------------- partitioned layout + pruning
    // Hive-style partitioned parquet: the read side must prune to the
    // single l_returnflag=R directory (PlanSpec asserts PartitionFilters)
    // — the layout that turns a 100 TB scan into a 30 TB one for free.
    QueryDef(
      "q30_partitioned_write",
      (s, dir) => {
        val out = tmp("graft_q30_part.parquet")
        t(s, dir, "lineitem")
          .write.mode("overwrite").partitionBy("l_returnflag")
          .option("compression", "zstd").parquet(out)
        s.read.parquet(out)
          .filter(col("l_returnflag") === "R")
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("l_extendedprice"), 2).as("sum_price"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
             |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)),

    // ------------------------------- dynamic partition pruning (DPP)
    // The at-scale pruning case static planning can't reach: the fact
    // table is partitioned by order month, but the predicate lives on
    // OTHER columns of a dimension (quarter + year), so the set of
    // month partitions to read is only known once the dim filter runs.
    // Spark's dynamic partition pruning plants a subquery filter on the
    // fact's partition column from the (broadcast) dim side — the scan
    // reads 3 month directories, not all of them. The query REQUIRES
    // the pruning expression in its own executed plan, so a config or
    // plan regression fails verification, not just a spec.
    QueryDef(
      "q30_dpp",
      (s, dir) => {
        // the partitioned fact fixture is deterministic per sf dir —
        // stage it ONCE (atomic publish) instead of rewriting the whole
        // orders table on every verify/bench/plan-dump invocation
        val out = graft.RunPaths.sharedFixture(
          s"graft_q30_dpp_${graft.RunPaths.keyFor(dir)}.parquet") { tmpOut =>
          t(s, dir, "orders")
            .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
            .write.mode("overwrite").partitionBy("om")
            .option("compression", "zstd").parquet(tmpOut)
        }
        val fact = s.read.parquet(out)
        val dim = t(s, dir, "orders")
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("d_om"),
            year(col("o_orderdate")).as("yr"),
            quarter(col("o_orderdate")).as("qtr"))
          .distinct()
        val joined = fact
          .join(dim.filter(col("yr") === 1996 && col("qtr") === 2),
            col("om") === col("d_om"))
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("o_totalprice"), 2).as("sum_price"))
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.toLowerCase.contains("dynamicpruning"),
          "dynamic partition pruning did not fire on the fact scan")
        joined
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
             |FROM orders
             |WHERE year(o_orderdate) = 1996 AND quarter(o_orderdate) = 2""".stripMargin)),

    // ------------------------------------- range-clustered layout
    // repartitionByRange + sortWithinPartitions on the filter key: every
    // output file covers a disjoint l_shipdate range, so parquet
    // row-group min/max stats let a date-range scan skip all but the
    // overlapping files — the sort-clustered cousin of hive
    // partitioning (no directory explosion for high-cardinality keys,
    // the layout a time-filtered 100 TB fact table wants).
    QueryDef(
      "q30_range_layout",
      (s, dir) => {
        val out = tmp("graft_q30_range.parquet")
        t(s, dir, "lineitem")
          .repartitionByRange(8, col("l_shipdate"))
          .sortWithinPartitions("l_shipdate")
          .write.mode("overwrite").option("compression", "zstd").parquet(out)
        s.read.parquet(out)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("l_quantity"), 2).as("sum_qty"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate <  TIMESTAMP '1997-07-01'""".stripMargin)),

    // --------------------------------------- bucketed co-located join
    // Both sides bucketed 8 ways on the join key: the join runs
    // shuffle-free (PlanSpec asserts no Exchange above either scan) —
    // the pre-partitioning pattern that amortizes one shuffle across
    // every downstream join at scale.
    QueryDef(
      "q30_bucketed_join",
      (s, dir) => {
        // Per-run table names: catalog tables are global per warehouse,
        // so concurrent runs sharing fixed names would drop each other's
        // data mid-query. DROP TABLE only clears the catalog entry; a
        // stale warehouse directory from a previous session makes
        // saveAsTable throw LOCATION_ALREADY_EXISTS, so remove the
        // physical location too.
        val ordersB = graft.RunPaths.suffixed("graft_orders_b")
        val customerB = graft.RunPaths.suffixed("graft_customer_b")
        def dropHard(table: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $table")
          val loc = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), table)
          loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
        }
        dropHard(ordersB)
        dropHard(customerB)
        t(s, dir, "orders")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ordersB)
        t(s, dir, "customer")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(customerB)
        s.table(ordersB)
          .join(s.table(customerB), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("total_price"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---------------------------------------- extended window functions
    QueryDef(
      "q31_window_extras",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cum_dist"),
            lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1, -1.0).over(w).as("next_price"),
            first(col("o_totalprice")).over(w).as("first_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  ntile(4) OVER w AS quartile,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cum_dist,
             |  coalesce(lag(o_totalprice, 1) OVER w, -1.0) AS prev_price,
             |  coalesce(lead(o_totalprice, 1) OVER w, -1.0) AS next_price,
             |  first_value(o_totalprice) OVER w AS first_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------- conditional / null-handling funcs
    QueryDef(
      "q31_conditional",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") >= 40, "bulk")
              .when(col("l_quantity") >= 10, "standard")
              .otherwise("small").as("tier"),
            coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_flag"),
            greatest(col("l_tax"), col("l_discount")).as("max_rate"),
            least(col("l_tax"), col("l_discount")).as("min_rate"),
            (col("l_returnflag") === "R").as("is_return"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_quantity >= 40 THEN 'bulk'
             |       WHEN l_quantity >= 10 THEN 'standard'
             |       ELSE 'small' END AS tier,
             |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
             |  greatest(l_tax, l_discount) AS max_rate,
             |  least(l_tax, l_discount) AS min_rate,
             |  l_returnflag = 'R' AS is_return
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------- CSV source round-trip
    // Spark-native CSV scan: write the table out with headers, read it
    // back through the csv source with an explicit schema (inference is
    // a second full pass — never at 100 TB), verify against the origin.
    QueryDef(
      "q32_csv_roundtrip",
      (s, dir) => {
        val out = tmp("graft_q32_supplier_csv")
        val src = t(s, dir, "supplier")
        src.write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(src.schema).option("header", "true").csv(out)
          .orderBy("s_suppkey")
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // --------------------------------- CSV malformed-row error surface
    // What the engine does when input is dirty — the ingestion contract
    // the reference answers with exit-1 and we answer with Spark's mode
    // semantics: PERMISSIVE keeps every row, parks unparseable ones in
    // the corrupt-record column (valid rows with empty fields are NOT
    // corrupt, just null), and FAILFAST throws on first malformation.
    // The fixture is a deliberate golden (known 5-line file), so the
    // oracle is a VALUES constant pinning all three behaviors at once.
    QueryDef(
      "q32_csv_malformed",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val outDir = tmp("graft_q32_malformed")
        new java.io.File(outDir).mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, "data.csv"),
          "id,amount\n1,10.5\n2,oops\n3,30.0\n4,\n5,1e3\n")
        val schema = StructType(Seq(
          StructField("id", LongType),
          StructField("amount", DoubleType),
          StructField("_corrupt_record", StringType)))
        val read = s.read.schema(schema)
          .option("header", "true").option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(outDir)
        // FAILFAST on the same file must throw (SparkException wrapping
        // the malformed-record error)
        val failfastThrows =
          try {
            s.read.schema(StructType(schema.dropRight(1)))
              .option("header", "true").option("mode", "FAILFAST")
              .csv(outDir).collect()
            false
          } catch {
            // only the malformed-record failure counts: a bad path or
            // analysis error must propagate, not masquerade as the
            // FAILFAST contract holding
            case e: org.apache.spark.SparkException
              if malformedCause(e) => true
          }
        read.agg(
          count(col("amount")).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(col("amount")).as("sum_amount"),
          lit(failfastThrows).as("failfast_throws"))
      },
      Some("""SELECT CAST(3 AS BIGINT) AS n_good,
             |  CAST(1 AS BIGINT) AS n_corrupt,
             |  CAST(1040.5 AS DOUBLE) AS sum_amount,
             |  true AS failfast_throws""".stripMargin)),

    // -------------------------------- JSON malformed-record error surface
    // The JSON-lines twin of q32_csv_malformed: PERMISSIVE parks rows
    // that aren't valid JSON (or whose types can't coerce) in the
    // corrupt-record column, valid rows with missing fields are just
    // null, and FAILFAST throws. Same golden-file + VALUES-oracle
    // pattern.
    QueryDef(
      "q32_json_malformed",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val outDir = tmp("graft_q32_json_malformed")
        new java.io.File(outDir).mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, "data.jsonl"),
          """{"id": 1, "amount": 10.5}
            |{"id": 2, "amount": "oops"}
            |not json at all
            |{"id": 4}
            |{"id": 5, "amount": 1000.0}
            |""".stripMargin)
        val schema = StructType(Seq(
          StructField("id", LongType),
          StructField("amount", DoubleType),
          StructField("_corrupt_record", StringType)))
        val read = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(outDir)
        val failfastThrows =
          try {
            s.read.schema(StructType(schema.dropRight(1)))
              .option("mode", "FAILFAST").json(outDir).collect()
            false
          } catch {
            case e: org.apache.spark.SparkException
              if malformedCause(e) => true
          }
        read.agg(
          count(col("amount")).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(col("amount")).as("sum_amount"),
          lit(failfastThrows).as("failfast_throws"))
      },
      Some("""SELECT CAST(2 AS BIGINT) AS n_good,
             |  CAST(2 AS BIGINT) AS n_corrupt,
             |  CAST(1010.5 AS DOUBLE) AS sum_amount,
             |  true AS failfast_throws""".stripMargin)),

    // -------------------------------------- parquet schema evolution
    // The ingestion reality: batch 2 adds a column batch 1 doesn't have.
    // mergeSchema unions the file footers at read time; old files
    // surface the new column as null. The aggregate pins both the merged
    // width (null count for old rows) and the values. At 100 TB the
    // merged-footer scan is why mergeSchema stays OFF by default —
    // here it's per-read opt-in on a two-batch directory, the bounded
    // case where it's the right tool (a table format owns schema
    // evolution past that).
    QueryDef(
      "q32_schema_evolution",
      (s, dir) => {
        val out = tmp("graft_q32_evolve")
        val n = t(s, dir, "nation")
        n.select(col("n_nationkey"), col("n_name"))
          .write.mode("overwrite").parquet(s"$out/batch=1")
        n.select(col("n_nationkey"), col("n_name"),
            length(col("n_name")).cast("long").as("name_len"))
          .write.mode("overwrite").parquet(s"$out/batch=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("name_len")).as("n_with_len"),
            sum(col("name_len")).as("len_sum"))
          .orderBy("batch")
      },
      Some("""WITH b1 AS (SELECT n_nationkey, NULL::BIGINT AS name_len FROM nation),
             |b2 AS (SELECT n_nationkey, CAST(len(n_name) AS BIGINT) AS name_len FROM nation)
             |SELECT 1 AS batch, count(*) AS n_rows,
             |       count(name_len) AS n_with_len,
             |       CAST(sum(name_len) AS BIGINT) AS len_sum
             |FROM b1
             |UNION ALL
             |SELECT 2, count(*), count(name_len), CAST(sum(name_len) AS BIGINT)
             |FROM b2
             |ORDER BY batch""".stripMargin)),

    // ------------------------------------------ JSON source round-trip
    QueryDef(
      "q32_json_roundtrip",
      (s, dir) => {
        val out = tmp("graft_q32_part_json")
        val src = t(s, dir, "part")
        src.write.mode("overwrite").json(out)
        s.read.schema(src.schema).json(out)
          .orderBy("p_partkey")
      },
      Some("SELECT * FROM part ORDER BY p_partkey")),

    // ------------------------------------------- ORC source round-trip
    // Spark's other columnar built-in; same pushdown/pruning properties
    // as parquet. Round-trip the supplier table through it.
    QueryDef(
      "q32_orc_roundtrip",
      (s, dir) => {
        val out = tmp("graft_q32_supplier_orc")
        val src = t(s, dir, "supplier")
        src.write.mode("overwrite").orc(out)
        s.read.schema(src.schema).orc(out)
          .orderBy("s_suppkey")
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // ----------------------------------------------- fixed-width histogram
    // Histogram with data-independent bucket bounds: a single partial-
    // aggregated pass (no pre-scan for min/max, which would be a second
    // full read at 100 TB; fixed bounds also keep buckets stable across
    // runs and partitions).
    QueryDef(
      "q29_histogram",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select((floor(col("l_extendedprice") / 10000)).cast("long").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy("bucket"),
      Some("""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ------------------------------------------------ column profiling
    // Per-column data-quality profile (null count, distinct count,
    // min/max) in ONE scan: each per-column aggregate is a column of a
    // single agg row, then unpivoted to (column, metric) rows. The
    // alternative — one query per column — re-reads the table N times.
    // Values are canonicalized to strings via DECIMAL(18,2) for doubles
    // so both engines format identically.
    QueryDef(
      "q29_profile",
      (s, dir) => {
        def prof(c: String, valExpr: Column): Seq[Column] = Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"),
          min(valExpr).as(s"${c}__min"),
          max(valExpr).as(s"${c}__max"))
        val aggs =
          prof("c_name", col("c_name")) ++
          prof("c_nationkey", col("c_nationkey").cast("string")) ++
          prof("c_acctbal", col("c_acctbal").cast(DecimalType(18, 2)).cast("string")) ++
          prof("c_mktsegment", col("c_mktsegment"))
        val one = t(s, dir, "customer").agg(aggs.head, aggs.tail: _*)
        val cols = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        val rows = cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_val"),
          col(s"${c}__max").as("max_val")))
        one.select(explode(array(rows: _*)).as("p"))
          .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
            col("p.min_val"), col("p.max_val"))
          .orderBy("col_name")
      },
      Some("""WITH one AS (
             |  SELECT
             |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    count(DISTINCT c_name) AS d1, min(c_name) AS mn1, max(c_name) AS mx1,
             |    CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    count(DISTINCT c_nationkey) AS d2,
             |    min(CAST(c_nationkey AS VARCHAR)) AS mn2, max(CAST(c_nationkey AS VARCHAR)) AS mx2,
             |    CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             |    count(DISTINCT c_acctbal) AS d3,
             |    min(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)) AS mn3,
             |    max(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)) AS mx3,
             |    CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             |    count(DISTINCT c_mktsegment) AS d4, min(c_mktsegment) AS mn4, max(c_mktsegment) AS mx4
             |  FROM customer)
             |SELECT 'c_acctbal' AS col_name, n3 AS n_nulls, d3 AS n_distinct, mn3 AS min_val, mx3 AS max_val FROM one
             |UNION ALL
             |SELECT 'c_mktsegment', n4, d4, mn4, mx4 FROM one
             |UNION ALL
             |SELECT 'c_name', n1, d1, mn1, mx1 FROM one
             |UNION ALL
             |SELECT 'c_nationkey', n2, d2, mn2, mx2 FROM one
             |ORDER BY col_name""".stripMargin)),

    // ------------------------------------ observed export accounting
    // The `Observation` API: release-accounting metrics (doc / char /
    // token mass, id bounds) collected ON the export scan itself — the
    // write action drives them, so a 100 TB export pays ZERO extra
    // passes for its datasheet row (q29_profile-style accounting would
    // re-read the corpus). Metrics are commutative aggregates delivered
    // to the driver by the observation listener, not a second query.
    QueryDef(
      "q62_observed_export",
      (s, dir) => {
        import s.implicits._
        val obs = org.apache.spark.sql.Observation()
        val out = tmp("graft_q62_export")
        t(s, dir, "documents")
          .observe(obs,
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .write.mode("overwrite").parquet(out)
        val m = obs.get
        Seq((m("n_docs").asInstanceOf[Long], m("n_chars").asInstanceOf[Long],
          m("n_tokens").asInstanceOf[Long], m("min_id").asInstanceOf[Long],
          m("max_id").asInstanceOf[Long]))
          .toDF("n_docs", "n_chars", "n_tokens", "min_id", "max_id")
      },
      Some("""SELECT count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents""".stripMargin))
  )
}
