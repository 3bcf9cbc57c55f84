package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.{Compaction, ZOrder}

/** Scale-hygiene operators: multi-dimensional z-order clustering,
  * small-file compaction, Bloom-filter join pruning, and Count-Min
  * frequency sketching. These are the operations that keep a 100 TB
  * lake queryable — they don't add query semantics, they buy scan-time
  * pruning, healthy file sizes, and shuffle avoidance. Each query's
  * oracle checks the user-visible result is EXACTLY the plain-query
  * result (layout and sketches must never change answers).
  */
object ScaleOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  private def tmp(name: String): String = graft.RunPaths.scratch(name)

  val all: Seq[QueryDef] = Seq(

    // ----------------------------------------- z-order clustered layout
    // Orders z-clustered on (o_custkey, order day): after the rewrite,
    // every file covers a narrow range of BOTH keys, so parquet min/max
    // stats prune a 2-D predicate's scan on either dimension — where a
    // plain sort only prunes its leading column. ZOrderSpec asserts the
    // per-file range-narrowing directly; this query proves the layout
    // changes no answers (same 2-D filter result as the raw table).
    QueryDef(
      "q30_zorder_layout",
      (s, dir) => {
        val out = tmp("graft_q30_zorder.parquet")
        val day = datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        ZOrder.cluster(t(s, dir, "orders"), col("o_custkey"), day,
            numFiles = 16, bits = 16)
          .write.mode("overwrite").option("compression", "zstd").parquet(out)
        s.read.parquet(out)
          .filter(col("o_custkey").between(100, 300) &&
            col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("o_totalprice"), 2).as("sum_price"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
             |FROM orders
             |WHERE o_custkey BETWEEN 100 AND 300
             |  AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate <  TIMESTAMP '1998-01-01'""".stripMargin)),

    // --------------------------------------------- small-file compaction
    // Deliberately fragment lineitem into 64 files, then compact with an
    // 8 MiB target. Compaction is coalesce-based (no shuffle: one read +
    // one write); the oracle proves rows survive exactly, and the file
    // count drops to ceil(bytes / target) — single digits at these SFs.
    QueryDef(
      "q30_compaction",
      (s, dir) => {
        val fragDir = tmp("graft_q30_frag.parquet")
        val outDir = tmp("graft_q30_compact.parquet")
        t(s, dir, "lineitem")
          .repartition(64, col("l_orderkey"))
          .write.mode("overwrite").parquet(fragDir)
        val stats = Compaction.compact(s, fragDir, outDir,
          targetFileBytes = 8L * 1024 * 1024)
        s.read.parquet(outDir)
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("l_extendedprice"), 2).as("sum_price"))
          .select(col("n_rows"), col("sum_price"),
            lit(stats.filesBefore).as("files_before"),
            (lit(stats.filesAfter) <= 8L && lit(stats.filesAfter) >= 1L)
              .as("compacted_ok"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price,
             |  CAST(64 AS BIGINT) AS files_before,
             |  true AS compacted_ok
             |FROM lineitem""".stripMargin)),

    // -------------------------------------------- Bloom-filter join pruning
    // The runtime-filter pattern, explicit: build a Bloom filter over the
    // dimension's join keys (driver-side — dimensions are small by
    // definition), prune the fact table with it BEFORE the shuffle, then
    // finish with the exact join. At scale this cuts the shuffled fact
    // bytes to ~the matching fraction (+ fpp); Bloom filters have no
    // false negatives, so the final result is exactly the plain join's —
    // which is what the oracle checks. bloom_tighter asserts the sketch
    // actually pruned (passed fewer rows than the full fact table).
    QueryDef(
      "q21_bloom_prune",
      (s, dir) => {
        val dim = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val nDim = dim.count()
        val bloom = dim.stat.bloomFilter("c_custkey", nDim, 0.03)
        val mightContain = udf((k: Long) => bloom.mightContainLong(k))
        val facts = t(s, dir, "orders")
        val nAll = facts.count()
        val pruned = facts.filter(mightContain(col("o_custkey")))
        val nPruned = pruned.count()
        pruned
          .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("total_price"))
          .select(col("n_orders"), col("total_price"),
            (lit(nPruned) >= col("n_orders") && lit(nPruned) < lit(nAll))
              .as("bloom_tighter"))
      },
      Some("""SELECT count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price,
             |  true AS bloom_tighter
             |FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin)),

    // ------------------------------------------- Count-Min frequency sketch
    // Mergeable heavy-key frequency estimation (the shuffle-free cousin
    // of groupBy-count for "how hot is this key" probes). Fixed seed
    // makes the sketch deterministic; the one-sided error contract
    // (estimate >= exact, overshoot <= eps * N) is emitted as booleans
    // the oracle pins, alongside the exact counts. Complements the
    // Misra-Gries HeavyHitters UDAF (q21_heavy_hitters), which gives
    // top-k identity; Count-Min answers point frequency queries.
    QueryDef(
      "q21_count_min",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val sketch = orders.stat.countMinSketch(
          col("o_custkey"), eps = 0.001, confidence = 0.99, seed = 42)
        val total = sketch.totalCount()
        val probes = (1L to 5L).map { k =>
          (k, sketch.estimateCount(java.lang.Long.valueOf(k)))
        }
        val est = probes.map { case (k, e) =>
          struct(lit(k).as("custkey"), lit(e).as("est"))
        }
        orders.filter(col("o_custkey").between(1, 5))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("exact_orders"))
          .join(
            orders.sparkSession.range(1)
              .select(explode(array(est: _*)).as("p"))
              .select(col("p.custkey"), col("p.est")),
            col("o_custkey") === col("custkey"))
          .select(col("custkey"), col("exact_orders"),
            (col("est") >= col("exact_orders") &&
              col("est") <= col("exact_orders") + lit(0.001 * total))
              .as("within_bounds"))
          .orderBy("custkey")
      },
      Some("""SELECT o_custkey AS custkey, count(*) AS exact_orders,
             |       true AS within_bounds
             |FROM orders WHERE o_custkey BETWEEN 1 AND 5
             |GROUP BY o_custkey ORDER BY custkey""".stripMargin)),

    // --------------------------- footer-statistics-only aggregation
    // COUNT/MIN/MAX answered from parquet footer statistics without
    // decoding a single data page — the difference between touching
    // 100 TB and touching its metadata. Spark's aggregate pushdown is a
    // DSv2-only rule, so the scan is opened through the V2 path and the
    // aggregate executed eagerly with the flag on (both configs are
    // restored before returning — the shared verify session must not
    // leak V2 scans into other queries' asserted plans). The executed
    // plan is REQUIRED to contain PushedAggregation: if the rule stops
    // firing, this query throws rather than silently paying the full
    // scan. The result is re-wrapped as a local relation for the
    // oracle compare.
    QueryDef(
      "q51_agg_pushdown",
      (s, dir) => {
        val conf = s.conf
        val prevPush = conf.getOption("spark.sql.parquet.aggregatePushdown")
        val prevV1 = conf.getOption("spark.sql.sources.useV1SourceList")
        val (rows, schema) = try {
          conf.set("spark.sql.parquet.aggregatePushdown", "true")
          conf.set("spark.sql.sources.useV1SourceList", "")
          val agg = s.read.parquet(s"$dir/lineitem.parquet")
            .agg(count(lit(1)).as("n_rows"),
              min(col("l_orderkey")).as("min_orderkey"),
              max(col("l_orderkey")).as("max_orderkey"),
              min(col("l_shipdate")).as("min_shipdate"),
              max(col("l_shipdate")).as("max_shipdate"))
          val collected = agg.collect()
          val plan = agg.queryExecution.executedPlan.toString
          require(plan.contains("PushedAggregation"),
            "parquet aggregate pushdown did not fire — the scan would " +
              "decode every data page instead of reading footer stats")
          (collected, agg.schema)
        } finally {
          prevPush.fold(conf.unset("spark.sql.parquet.aggregatePushdown"))(
            conf.set("spark.sql.parquet.aggregatePushdown", _))
          prevV1.fold(conf.unset("spark.sql.sources.useV1SourceList"))(
            conf.set("spark.sql.sources.useV1SourceList", _))
        }
        // re-wrap the (one) collected row with its own schema — typed
        // getters would have to care whether the session returns
        // java.sql or java.time values; createDataFrame accepts either
        s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      },
      Some("""SELECT count(*) AS n_rows,
             |  min(l_orderkey) AS min_orderkey,
             |  max(l_orderkey) AS max_orderkey,
             |  min(l_shipdate) AS min_shipdate,
             |  max(l_shipdate) AS max_shipdate
             |FROM lineitem""".stripMargin)),

    // ------------------------------ mergeable distinct-count rollup
    // The incremental-distinct shape: per-DAY HLL sketches (Datasketches
    // HllSketch via hll_sketch_agg) merged up to weeks with
    // hll_union_agg. At 100 TB the daily sketch table is what you
    // STORE — any window's distinct-user count is then a merge of
    // fixed-size sketch blobs (shuffle carries ~KB per day, never user
    // ids), and a new day appends one sketch without touching history —
    // where count(DISTINCT) rescans every event of every window it
    // answers. The query emits the EXACT weekly distincts (both engines
    // agree) plus a within-5% check of the sketch estimate against
    // exact (lgConfigK=12 → ~1.6% standard error; same
    // emit-the-invariant pattern as q21_count_min, since DuckDB cannot
    // replay Datasketches bytes).
    QueryDef(
      "q51_hll_rollup",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val weeklyEst = daily
          .groupBy(to_date(date_trunc("week", col("day"))).as("week"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("est"))
        val exact = ev
          .groupBy(to_date(date_trunc("week", col("ts"))).as("week"))
          .agg(count_distinct(col("user_id")).as("exact_users"))
        exact.join(weeklyEst, "week")
          .select(col("week"), col("exact_users"),
            (abs(col("est") - col("exact_users")) <=
              col("exact_users") * lit(0.05)).as("within_bounds"))
          .orderBy("week")
      },
      Some("""SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             |  count(DISTINCT user_id) AS exact_users,
             |  true AS within_bounds
             |FROM events GROUP BY 1 ORDER BY week""".stripMargin))
  )
}
