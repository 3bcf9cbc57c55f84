package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Typed rows for the Dataset[T] surface (q03_typed_dataset). */
case class OrderRow(
    o_orderkey: Long, o_custkey: Long,
    o_orderpriority: String, o_totalprice: Double)
case class PriorityAgg(priority: String, n_orders: Long, total_cents: Long)

/** Declared relational inventory (SURVEY.md §2.2, Q1–Q19): scans, filters,
  * joins (broadcast / outer / semi / anti / range), aggregation, distinct,
  * rollup, windows, sort/limit, set ops, and the scalar function families.
  *
  * All queries use Spark built-ins so Catalyst supplies pushdown, pruning,
  * join selection and whole-stage codegen. Scale notes live on each query.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Order-independent exact sum of a 2-decimal double column (see QueryDef). */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(27, scale))).cast("double")

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- scans
    QueryDef(
      "q01_scan_counts",
      (s, dir) =>
        Tables.names
          .map(n => t(s, dir, n).agg(count(lit(1)).as("cnt")).select(lit(n).as("tbl"), col("cnt")))
          .reduce(_ unionAll _)
          .orderBy("tbl"),
      Some(Tables.names
        .map(n => s"SELECT '$n' AS tbl, count(*) AS cnt FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"))),

    // ---------------------------------------------- projection / rename (R5/R6)
    QueryDef(
      "q03_project_rename",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey").as("order_id"),
            col("l_linenumber").as("line_no"),
            col("l_extendedprice").as("price"))
          .orderBy("order_id", "line_no"),
      Some("""SELECT l_orderkey AS order_id, l_linenumber AS line_no,
             |       l_extendedprice AS price
             |FROM lineitem ORDER BY order_id, line_no""".stripMargin)),

    // ---------------------------------------------- typed Dataset API
    // The Dataset[T] surface: Encoder-backed case class, lambda filter,
    // groupByKey + mapGroups with arbitrary Scala in the group function
    // (an exact cents accumulator — long arithmetic, order-independent).
    // The tradeoff is explicit: typed lambdas deserialize every row and
    // break whole-stage codegen, so this surface is for logic that
    // genuinely needs Scala (custom state machines, library calls), not
    // for relational shapes — every other query here stays columnar.
    // Partial aggregation is lost under mapGroups (full shuffle of
    // matching rows), which is the honest cost model at 100 TB too.
    QueryDef(
      "q03_typed_dataset",
      (s, dir) => {
        import s.implicits._
        val ds = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority"), col("o_totalprice"))
          .as[OrderRow]
        ds.filter(o => o.o_totalprice > 150000.0 &&
            !o.o_orderpriority.startsWith("1"))
          .groupByKey(_.o_orderpriority)
          .mapGroups { (priority, rows) =>
            var n = 0L; var cents = 0L
            rows.foreach { o => n += 1; cents += math.round(o.o_totalprice * 100) }
            PriorityAgg(priority, n, cents)
          }
          .toDF()
          .orderBy("priority")
      },
      Some("""SELECT o_orderpriority AS priority, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM orders
             |WHERE o_totalprice > 150000.0 AND o_orderpriority NOT LIKE '1%'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------- filter (TPC-H Q6 shape)
    // Predicates push down to the parquet scan (PushedFilters on l_shipdate /
    // l_discount / l_quantity); at 100 TB this is the difference between a
    // full scan and reading a fraction of row groups via min/max stats.
    QueryDef(
      "q04_filter_pushdown",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 25)
          .agg(
            dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
             |       count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""".stripMargin),
      bench = true),

    // --------------------------------------- multi-way star join w/ broadcast
    // nation/region/customer are classic broadcast dims: at any scale they fit
    // in memory, so the only shuffle is orders→customer (and AQE may convert
    // that to broadcast too at small SF). Explicit broadcast() hints keep the
    // plan shuffle-free on the dim side at 100 TB.
    QueryDef(
      "q05_join_star",
      (s, dir) => {
        val orders   = t(s, dir, "orders")
        val customer = t(s, dir, "customer")
        val nation   = t(s, dir, "nation")
        val region   = t(s, dir, "region")
        orders
          .join(customer, orders("o_custkey") === customer("c_custkey"))
          .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total_price"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_orders,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_price
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
      bench = true),

    // ------------------------------------------------------------ outer join
    QueryDef(
      "q06_join_outer",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val orders   = t(s, dir, "orders")
        customer
          .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------- semi join
    QueryDef(
      "q06_join_semi",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val orders   = t(s, dir, "orders").select(col("o_custkey"))
        customer
          .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------- anti join
    // Customers with no high-value order (threshold keeps the result
    // non-empty — every customer has at least one order in this data).
    QueryDef(
      "q06_join_anti",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val orders = t(s, dir, "orders")
          .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
        customer
          .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------- range (interval) join
    // Pairs of same-type events within one hour. A naive non-equi join plans
    // as a nested-loop — O(n^2) and hopeless at scale. We add a derived
    // equi-key: bucket timestamps into hours and explode the left side into
    // the two buckets a match can live in; the join becomes an equi-join on
    // (event_type, bucket) with the range predicate as a residual filter.
    // This is the standard scalable range-join rewrite (cost 2x left input,
    // shuffle on a composite key instead of a cartesian product).
    QueryDef(
      "q07_join_range",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_id"), col("ts"), col("event_type"))
        val hour = (c: Column) => floor(unix_timestamp(c) / 3600L)
        val a = e.withColumn("bucket", explode(array(hour(col("ts")), hour(col("ts")) + 1)))
        val b = e.select(
          col("event_id").as("b_id"), col("ts").as("b_ts"),
          col("event_type").as("b_type"), hour(col("ts")).as("bucket"))
        a.join(b,
            a("bucket") === b("bucket") && a("event_type") === b("b_type") &&
            col("b_ts") > a("ts") && col("b_ts") <= a("ts") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("event_type")
      },
      Some("""SELECT a.event_type AS event_type, count(*) AS n_pairs
             |FROM events a JOIN events b
             |  ON a.event_type = b.event_type
             | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // ----------------------------------------------- aggregation (TPC-H Q1)
    // Partial (map-side) aggregation happens automatically for sum/count;
    // the shuffle carries only 4-ish groups x partial buffers, not rows.
    QueryDef(
      "q08_agg_tpch_q1",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val disc   = col("l_extendedprice") * (lit(1) - col("l_discount"))
        val charge = (col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax"))
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity"), 2).as("sum_qty"),
            dsum(col("l_extendedprice"), 2).as("sum_base_price"),
            dsum(disc, 4).as("sum_disc_price"),
            dsum(charge, 6).as("sum_charge"),
            (sum(col("l_quantity").cast(DecimalType(27, 2))).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // -------------------------------------------------------- exact distinct
    QueryDef(
      "q09_distinct",
      (s, dir) =>
        t(s, dir, "lineitem").agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |       count(DISTINCT l_suppkey) AS n_supps,
             |       count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem""".stripMargin)),

    // ------------------------------------- approx distinct (HLL — rows-only)
    // No oracle: approx_count_distinct is an estimate; DuckDB's HLL would
    // produce a different estimate. DistinctSpec asserts the ±2% tolerance.
    QueryDef(
      "q09_approx_distinct",
      (s, dir) =>
        // The correctness contract of an approximate sketch is its error
        // bound, so the query emits the exact counts plus booleans
        // asserting HLL++ landed within the declared 2% rsd (x2.5 slack);
        // both are deterministic given the fixed table, so the oracle can
        // hash-check them. The raw sketch values stay engine-internal.
        t(s, dir, "lineitem").agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          (abs(approx_count_distinct(col("l_partkey"), 0.02) - countDistinct(col("l_partkey")))
            .cast("double") / countDistinct(col("l_partkey")) <= 0.05).as("parts_ok"),
          (abs(approx_count_distinct(col("l_orderkey"), 0.02) - countDistinct(col("l_orderkey")))
            .cast("double") / countDistinct(col("l_orderkey")) <= 0.05).as("orders_ok")),
      Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |       true AS parts_ok, true AS orders_ok
             |FROM lineitem""".stripMargin)),

    // ----------------------------------------------------------------- rollup
    // COALESCE folds the rollup's grouping NULLs into 'ALL' so NULL-ordering
    // differences between engines can't affect the sort.
    QueryDef(
      "q10_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity"), 2).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n_rows"), col("sum_qty"))
          .orderBy("flag", "status"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
             |       coalesce(l_linestatus, 'ALL') AS status,
             |       count(*) AS n_rows,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY flag, status""".stripMargin)),

    // ----------------------------------------------------------------- cube
    QueryDef(
      "q10_cube",
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_rows"))
          .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |       coalesce(o_orderpriority, 'ALL') AS priority,
             |       count(*) AS n_rows
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // ------------------------------------------------------- window: ranking
    // Top-3 orders per customer. row_number (not rank) with a full tiebreak
    // (o_orderkey) so the result is deterministic.
    QueryDef(
      "q11_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         CAST(row_number() OVER (PARTITION BY o_custkey
             |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
             |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      bench = true),

    // -------------------------------------------- window: analytic + frames
    // Running revenue per customer plus lag. The cumulative sum goes through
    // DECIMAL so every prefix is exact (same value in both engines).
    QueryDef(
      "q12_window_running",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
            sum(col("o_totalprice").cast(DecimalType(27, 2)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_total"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
             |  lag(o_totalprice, 1) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // -------------------------------------------------------- sort / top-k
    // orderBy+limit plans as TakeOrderedAndProject: per-partition heaps, no
    // full sort, no full shuffle — the right shape for top-k at any scale.
    QueryDef(
      "q13_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin),
      bench = true),

    // --------------------------------------------------------------- set ops
    QueryDef(
      "q14_union",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
          .union(t(s, dir, "orders").filter(col("o_totalprice") > 200000).select(col("o_custkey").as("key")))
          .distinct()
          .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
             |UNION
             |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
             |ORDER BY key""".stripMargin)),

    QueryDef(
      "q14_intersect",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
          .intersect(t(s, dir, "orders").filter(col("o_totalprice") > 200000).select(col("o_custkey").as("key")))
          .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
             |INTERSECT
             |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
             |ORDER BY key""".stripMargin)),

    QueryDef(
      "q14_except",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
          .except(t(s, dir, "orders").filter(col("o_totalprice") > 200000).select(col("o_custkey").as("key")))
          .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
             |EXCEPT
             |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
             |ORDER BY key""".stripMargin)),

    // ---------------------------------------------------- string functions
    QueryDef(
      "q15_string_fns",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up_name"),
            substring(col("p_name"), 1, 5).as("pfx"),
            concat(col("p_brand"), lit(":"), col("p_type")).as("tag"),
            size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
            regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
            levenshtein(col("p_name"), lit("widget")).cast("long").as("lev_dist"),
            length(col("p_name")).cast("long").as("name_len"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up_name,
             |  substring(p_name, 1, 5) AS pfx,
             |  concat(p_brand, ':', p_type) AS tag,
             |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
             |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             |  CAST(levenshtein(p_name, 'widget') AS BIGINT) AS lev_dist,
             |  CAST(length(p_name) AS BIGINT) AS name_len
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ------------------------------------------------------- date functions
    QueryDef(
      "q16_date_fns",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  CAST(month(o_orderdate) AS BIGINT) AS mo,
             |  CAST(day(o_orderdate) AS BIGINT) AS dom,
             |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS days_since
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------- math functions
    // sqrt is IEEE correctly-rounded (identical across engines); power(x, 2)
    // on integral quantities is exact; round on 2-decimal inputs is exact.
    QueryDef(
      "q17_math_fns",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            // scale 3: the true value of a 2-decimal price x 0.1 has exactly
            // 3 decimals, so rounding is boundary-free and engine-agnostic
            // (at scale 2, Spark's BigDecimal HALF_UP and DuckDB's
            // double-multiply rounding disagree on .xx5 boundaries).
            round(col("l_extendedprice") * 0.1, 3).as("tenth"),
            abs(col("l_discount") - 0.05).as("abs_disc"),
            pow(col("l_quantity"), 2).as("qty_sq"),
            sqrt(col("l_extendedprice")).as("price_sqrt"),
            floor(col("l_extendedprice")).cast("long").as("price_floor"),
            ceil(col("l_extendedprice")).cast("long").as("price_ceil"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice * 0.1, 3) AS tenth,
             |  abs(l_discount - 0.05) AS abs_disc,
             |  power(l_quantity, 2) AS qty_sq,
             |  sqrt(l_extendedprice) AS price_sqrt,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------ array functions
    // Higher-order fold (functions.aggregate) keeps the per-vector sum inside
    // codegen, accumulating in index order with a DOUBLE accumulator — the
    // same deterministic left-fold DuckDB's correlated unnest-sum performs.
    QueryDef(
      "q18_array_fns",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            element_at(col("embedding"), 1).cast("double").as("e1"),
            round(aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double")), 6).as("vec_sum"),
            round(aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("vec_norm_sq"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS BIGINT) AS dim,
             |  CAST(embedding[1] AS DOUBLE) AS e1,
             |  round((SELECT sum(CAST(u.x AS DOUBLE)) FROM unnest(embedding) AS u(x)), 6) AS vec_sum,
             |  round((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE)) FROM unnest(embedding) AS u(x)), 6) AS vec_norm_sq
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ------------------------------------------------------- JSON functions
    QueryDef(
      "q19_json_fns",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---------------------------------------- grouped JSON extraction detail
    QueryDef(
      "q19_json_scalar",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------ VARIANT (Spark 4)
    // Semi-structured JSON through the modern column type: parse_json →
    // VariantType, typed path extraction with variant_get (nested
    // object + array index + boolean), and try_variant_get's null
    // contract on a missing path. The nested document is synthesized
    // deterministically from event fields (q25_pii_scrub precedent:
    // testdata's props is a flat {"k": n}, too thin to exercise
    // nesting) so both engines see identical input. At 100 TB VARIANT
    // is the semi-structured scan story: parquet shredding stores
    // extracted paths columnar, so variant_get reads a column instead
    // of re-parsing JSON per row — same pipeline code, storage-level
    // win. Everything extracted is integer/string/boolean — exact.
    QueryDef(
      "q19_variant",
      (s, dir) => {
        val j = concat(
          lit("""{"user":{"id":"""), col("user_id"),
          lit(""","type":""""), col("event_type"), lit("\""),
          lit("""},"vals":["""), col("event_id") % 7, lit(","),
          col("event_id") % 11, lit("""],"flag":"""),
          when(col("event_id") % 2 === 0, lit("true")).otherwise(lit("false")),
          lit("}"))
        t(s, dir, "events")
          .select(parse_json(j).as("v"))
          .select(
            variant_get(col("v"), "$.user.type", "string").as("vtype"),
            variant_get(col("v"), "$.user.id", "bigint").as("uid"),
            (variant_get(col("v"), "$.vals[0]", "bigint") +
              variant_get(col("v"), "$.vals[1]", "bigint")).as("val_sum"),
            variant_get(col("v"), "$.flag", "boolean").as("flag"),
            try_variant_get(col("v"), "$.missing", "bigint").as("absent"))
          .groupBy(col("vtype"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("uid")).as("uid_sum"),
            sum(col("val_sum")).as("vals_sum"),
            sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged"),
            count(col("absent")).as("n_absent"))
          .orderBy("vtype")
      },
      Some("""WITH j AS (
             |  SELECT '{"user":{"id":' || user_id ||
             |         ',"type":"' || event_type || '"' ||
             |         '},"vals":[' || (event_id % 7) || ',' || (event_id % 11) ||
             |         '],"flag":' || (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END) ||
             |         '}' AS v
             |  FROM events)
             |SELECT json_extract_string(v, '$.user.type') AS vtype,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(json_extract(v, '$.user.id') AS BIGINT)) AS BIGINT) AS uid_sum,
             |  CAST(sum(CAST(json_extract(v, '$.vals[0]') AS BIGINT)
             |         + CAST(json_extract(v, '$.vals[1]') AS BIGINT)) AS BIGINT) AS vals_sum,
             |  CAST(sum(CASE WHEN CAST(json_extract(v, '$.flag') AS BOOLEAN) THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
             |  CAST(count(json_extract(v, '$.missing')) AS BIGINT) AS n_absent
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --------------------------------------- SQL pipe syntax (Spark 4)
    // The same TPC-H-Q1-shaped rollup phrased in Spark 4's SQL pipe
    // syntax (|> operators compose left-to-right — the ergonomic
    // surface for exploratory pipelines). Pipe syntax desugars to the
    // identical logical plan, so it inherits every Catalyst
    // optimization; the oracle is the plain-SQL phrasing, proving the
    // two surfaces agree.
    QueryDef(
      "q05_sql_pipe",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .createOrReplaceTempView(graft.RunPaths.suffixed("lineitem_pipe"))
        s.sql(s"""
          FROM ${graft.RunPaths.suffixed("lineitem_pipe")}
          |> WHERE l_shipdate <= DATE '1998-09-02'
          |> AGGREGATE count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price
               GROUP BY l_returnflag, l_linestatus
          |> ORDER BY l_returnflag, l_linestatus""")
          .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty", "sum_price")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price
             |FROM lineitem
             |WHERE l_shipdate <= DATE '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // --------------------------------------- SQL scripting (Spark 4)
    // The third Spark-4 SQL surface (after VARIANT and pipe syntax):
    // procedural BEGIN...END with DECLARE / WHILE / IF local control
    // flow, each statement a full Catalyst query. The script sweeps
    // five quantity thresholds, accumulating hit counts and recording
    // the first threshold covering more than half the table; the
    // oracle is the set-based formulation of the same sweep — proving
    // the procedural surface and the relational one agree. (Scripting
    // is enabled engine-wide in GraftSession: a parse gate only.)
    QueryDef(
      "q63_sql_script",
      (s, dir) => {
        val v = graft.RunPaths.suffixed("lineitem_script")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView(v)
        s.sql(s"""
          BEGIN
            DECLARE i INT DEFAULT 1;
            DECLARE acc BIGINT DEFAULT 0;
            DECLARE c BIGINT DEFAULT 0;
            DECLARE first_over INT DEFAULT 0;
            DECLARE half BIGINT DEFAULT 0;
            SET half = (SELECT count(*) FROM $v) DIV 2;
            WHILE i <= 5 DO
              SET c = (SELECT count(*) FROM $v WHERE l_quantity < i * 10);
              SET acc = acc + c;
              IF first_over = 0 AND c > half THEN
                SET first_over = i;
              END IF;
              SET i = i + 1;
            END WHILE;
            SELECT acc AS total_hits,
                   CAST(first_over AS BIGINT) AS first_over_half;
          END""")
      },
      Some("""WITH t AS (
             |  SELECT i,
             |    (SELECT count(*) FROM lineitem WHERE l_quantity < i * 10)
             |      AS cnt
             |  FROM range(1, 6) r(i)),
             |half AS (SELECT count(*) // 2 AS h FROM lineitem)
             |SELECT CAST(sum(cnt) AS BIGINT) AS total_hits,
             |  CAST(coalesce(min(CASE WHEN cnt > h THEN i END), 0) AS BIGINT)
             |    AS first_over_half
             |FROM t, half""".stripMargin))
  )
}
