package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, SaltedJoin}

/** Coverage extensions: as-of join, the remaining array/map/JSON function
  * families, and the SQL entry surface (spark.sql over temp views).
  */
object Extended {

  /** AQE skew-join demonstration — the runtime counterpart of
    * [[graft.operators.SaltedJoin]]'s build-time salting: a 90%-hot join
    * key whose sort-merge join AQE's OptimizeSkewedJoin splits at
    * runtime. When to use which (the q06 pair documents both): AQE
    * handles skew it can SEE — shuffle-map partition sizes of a
    * sort-merge/shuffled-hash join — with zero code changes and no extra
    * shuffle, so it is the default; explicit salting remains the tool
    * for what AQE cannot touch (broadcast-ineligible extreme single-key
    * skew where splitting one partition still leaves one straggler per
    * split limit, aggregations keyed by the hot column, and engines/
    * paths without adaptive execution).
    *
    * Built on an ISOLATED child session (`newSession`: same
    * SparkContext, own conf) so the demonstration's aggressive skew
    * thresholds — sized for the test SFs, where default 256 MB
    * thresholds would never fire — cannot leak into other queries
    * sharing the driver session. The `merge` hint pins the sort-merge
    * join (the dim side would otherwise broadcast and dissolve the
    * skew), mirroring production skew cases where the big side's
    * partner is over the broadcast threshold.
    */
  private[graft] def skewAqeJoin(
      s0: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    // repartition(16) exists only to give the join shuffle MULTIPLE map
    // tasks: AQE splits a skewed reducer partition at map-output-block
    // boundaries, so a single-mapper stage (one local parquet file = one
    // scan task) is unsplittable no matter how skewed — "left 0 skewed
    // partitions" with a 17x max/median ratio. A real cluster input has
    // thousands of mappers and needs no such step.
    val events = Tables.load(s, dir, "events")
      .repartition(16)
      .withColumn("skew_key",
        when(col("event_id") % 10 < 9, lit("hot"))
          .otherwise(concat(lit("cold_"), (col("event_id") % 97).cast("string"))))
    // The dim is built from range/union, NOT events.select(key).distinct():
    // a distinct puts a HashAggregate between the join's Sort and its
    // shuffle stage, and OptimizeSkewedJoin only matches
    // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — a derived dim
    // silently disqualifies the join from skew handling.
    val dim = s.range(0, 97)
      .select(concat(lit("cold_"), col("id").cast("string")).as("d_key"))
      .union(s.range(0, 1).select(lit("hot").as("d_key")))
      .withColumn("key_len", length(col("d_key")).cast("long"))
    // The rollup groups by a DERIVED key class, not skew_key itself:
    // grouping by the join key would let the final aggregate ride the
    // join's hash partitioning, and OptimizeSkewedJoin (correctly)
    // refuses to split a partition some downstream operator still
    // requires intact — the classic silent reason "why didn't my skew
    // join fire". A derived grouping key needs its own exchange anyway,
    // so the join stage ends at a shuffle and the split is free to apply.
    events.join(dim.hint("merge"), col("skew_key") === col("d_key"))
      .groupBy(substring(col("skew_key"), 1, 4).as("key_class"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(27, 2)))
          .cast("double").as("sum_value"),
        sum(col("key_len")).as("key_len_mass"))
      .orderBy("key_class")
  }

  /** Root paths of every file-source relation the optimized plan
    * scans — the plan-required contract probe shared by the
    * q74/q79/q80 materialized-summary family.
    */
  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten

  /** Once-per-(JVM, dir) derivation of the q74 summary cube, which
    * BOTH q74 entries consume from one scratch path: an unguarded
    * per-construction overwrite raced when the registry is constructed
    * concurrently (WindowGuardSpec's r16 parallel sweep caught one
    * entry reading parquet footers mid-overwrite by its sibling).
    * computeIfAbsent serializes the derivation exactly like the
    * ensure*ServeLayout guards; content is identical from either
    * entry, so first-wins is correct.
    */
  private val q74SummaryCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureQ74Summary(
      s: org.apache.spark.sql.SparkSession, dir: String): String =
    q74SummaryCache.computeIfAbsent(dir, _ => {
      import org.apache.spark.sql.functions._
      val sumPath = graft.RunPaths.scratch(
        "graft_q74_summary_" + graft.RunPaths.keyFor(dir))
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_partkey")).as("sum_l_partkey"),
          min(col("l_quantity")).as("min_l_quantity"),
          max(col("l_quantity")).as("max_l_quantity"))
        .write.mode("overwrite").parquet(sumPath)
      sumPath
    })

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------- as-of join
    // Most recent order date per user at each event's timestamp, via the
    // union-sort window trick (one shuffle on the key; see AsOfJoin).
    QueryDef(
      "q07_asof_join",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val orders = Tables.load(s, dir, "orders")
        AsOfJoin(events, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightVals = Seq("o_orderdate" -> "last_order_date"))
          .select(col("event_id"), col("user_id"), col("last_order_date"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  (SELECT max(o_orderdate) FROM orders
             |   WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_date
             |FROM events ORDER BY event_id""".stripMargin)),

    // ----------------------------------- as-of join via SQL window trick
    // The union-sort formulation of AsOfJoin written as plain SQL: union
    // both sides keyed and time-ordered (orders before events on ties so
    // <= is inclusive), running max over the order-date column, keep the
    // event rows. ONE shuffle on the key — the plan that survives scale.
    // The naive correlated-subquery phrasing (which IS the DuckDB oracle
    // below) decorrelates in Spark to a broadcast-nested-loop join over
    // events×orders — measured unrunnable at sf0.1 — which is precisely
    // why the as-of surface ships as this rewrite + the AsOfJoin
    // operator, not as the correlated form.
    QueryDef(
      "q07_asof_sql",
      (s, dir) => {
        Tables.load(s, dir, "events").createOrReplaceTempView("events_asql")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_asql")
        s.sql("""
          WITH u AS (
            SELECT o_custkey AS k, o_orderdate AS t, 0 AS side,
                   o_orderdate AS od, CAST(NULL AS BIGINT) AS event_id
            FROM orders_asql
            UNION ALL
            SELECT user_id, ts, 1, CAST(NULL AS TIMESTAMP), event_id
            FROM events_asql),
          w AS (
            SELECT k, side, event_id,
                   max(od) OVER (PARTITION BY k ORDER BY t, side
                                 ROWS UNBOUNDED PRECEDING) AS last_order_date
            FROM u)
          SELECT event_id, k AS user_id, last_order_date
          FROM w WHERE side = 1 ORDER BY event_id""")
      },
      Some("""SELECT event_id, user_id,
             |  (SELECT max(o_orderdate) FROM orders
             |   WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_date
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---------------------------------------------------- grouping sets
    // Direct GROUPING SETS (rollup/cube are in q10_*): two unrelated
    // groupings in one pass over lineitem.
    QueryDef(
      "q10_grouping_sets",
      (s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql("""
          SELECT coalesce(l_returnflag, 'ALL') AS flag,
                 coalesce(l_linestatus, 'ALL') AS status,
                 count(*) AS n_rows
          FROM lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY flag, status""")
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
             |       coalesce(l_linestatus, 'ALL') AS status,
             |       count(*) AS n_rows
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY flag, status""".stripMargin)),

    // ------------------------------------------------ salted skew join
    // events.event_type has 5 hot keys (~n/5 rows each) — the shape where
    // a plain shuffle join sends each hot key to one reducer. SaltedJoin
    // spreads each key over 8 salts; the result is exactly the plain
    // join, which is what the oracle checks.
    QueryDef(
      "q06_join_salted",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val dim = events.select(col("event_type").as("t_type")).distinct()
          .withColumn("type_len", length(col("t_type")).cast("long"))
        SaltedJoin(events, dim, "event_type", "t_type", salts = 8)
          .groupBy(col("event_type"), col("type_len"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(27, 2)))
              .cast("double").as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(length(event_type) AS BIGINT) AS type_len,
             |       count(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // --------------------------------------------- AQE runtime skew join
    // The adaptive twin of q06_join_salted (see [[skewAqeJoin]]): a
    // deliberately 90%-hot key, sort-merge joined, left for AQE's
    // OptimizeSkewedJoin to split at RUNTIME from observed shuffle-map
    // sizes — no salting code, no extra shuffle. The executed plan is
    // asserted in SkewJoinSpec (SortMergeJoin(skew=true)); the oracle
    // checks the result equals the plain join, which is AQE's contract
    // (the dim join is an identity on the derived key, so the oracle
    // reduces to the direct rollup).
    QueryDef(
      "q06_join_skew_aqe",
      (s, dir) => skewAqeJoin(s, dir),
      Some("""WITH e AS (
             |  SELECT *, CASE WHEN event_id % 10 < 9 THEN 'hot'
             |                 ELSE 'cold_' || CAST(event_id % 97 AS VARCHAR)
             |            END AS skew_key
             |  FROM events)
             |SELECT substring(skew_key, 1, 4) AS key_class,
             |       count(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value,
             |       CAST(sum(length(skew_key)) AS BIGINT) AS key_len_mass
             |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // -------------------------------------------- explode + array_contains
    QueryDef(
      "q18_explode_tokens",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc)
          .limit(20),
      Some("""SELECT token, count(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin)),

    QueryDef(
      "q18_array_contains",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            array_contains(split(col("text"), " "), "the").as("has_the"),
            array_position(split(col("text"), " "), "the").cast("long").as("first_the"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_contains(string_split(text, ' '), 'the') AS has_the,
             |  CAST(coalesce(list_position(string_split(text, ' '), 'the'), 0) AS BIGINT) AS first_the
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------- from_json / map functions
    QueryDef(
      "q19_from_json_map",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select(col("event_id"),
            from_json(col("props"),
              org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")).as("m"))
          .select(col("event_id"),
            element_at(map_keys(col("m")), 1).as("first_key"),
            element_at(col("m"), "k").cast("long").as("k_val"),
            size(col("m")).cast("long").as("n_keys"))
          .orderBy("event_id"),
      Some("""SELECT event_id, 'k' AS first_key,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             |  CAST(1 AS BIGINT) AS n_keys
             |FROM events ORDER BY event_id""".stripMargin)),

    // -------------------------------------------------- SQL entry surface
    // TPC-H Q3 shape through spark.sql over temp views — same Catalyst
    // plan as the DSL path, proving the SQL front door.
    QueryDef(
      "q05_sql_tpch_q3",
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_v")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""
          SELECT o_orderkey,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
                 o_orderdate
          FROM customer_v JOIN orders_v ON c_custkey = o_custkey
                          JOIN lineitem_v ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY o_orderkey, o_orderdate
          ORDER BY revenue DESC, o_orderkey ASC
          LIMIT 10""")
      },
      Some("""SELECT o_orderkey,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
             |  o_orderdate
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |              JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey ASC
             |LIMIT 10""".stripMargin),
      bench = true),

    // ----------------------------------------- subquery SQL surface
    // Correlated EXISTS (Catalyst rewrites it to a left-semi join — no
    // per-row subquery execution), uncorrelated scalar subquery (computed
    // once, broadcast as a literal), and correlated NOT IN via anti join.
    // The DECIMAL-cast avg keeps the scalar deterministic on both engines.
    QueryDef(
      "q05_sql_subqueries",
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_sq")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_sq")
        s.sql("""
          SELECT c_custkey, c_mktsegment
          FROM customer_sq c
          WHERE EXISTS (SELECT 1 FROM orders_sq o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
            AND c_acctbal > (SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
                             FROM customer_sq)
            AND c_custkey NOT IN (SELECT o_custkey FROM orders_sq
                                  WHERE o_orderpriority = '1-URGENT'
                                    AND o_totalprice > 400000)
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 300000)
             |  AND c_acctbal > (SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
             |                   FROM customer)
             |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_orderpriority = '1-URGENT'
             |                          AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // --------------------------------------- LATERAL subquery (SQL)
    // Correlated LATERAL derived table with ORDER BY + LIMIT — the
    // "top-N per row" SQL surface. Catalyst DECORRELATES it (domain
    // join + per-key rank) instead of executing a per-customer nested
    // loop; the query REQUIRES the executed plan to be free of nested
    // loops so a regression in decorrelation fails the drive, not just
    // the stopwatch. DuckDB runs the identical LATERAL phrasing.
    QueryDef(
      "q05_sql_lateral",
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_lat")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_lat")
        val df = s.sql("""
          SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          FROM customer_lat c, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders_lat
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2) o
          WHERE c.c_mktsegment = 'AUTOMOBILE'
          ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
        val plan = df.queryExecution.executedPlan.toString
        require(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          "LATERAL subquery was not decorrelated — nested loop in plan")
        df
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, o_totalprice
             |  FROM orders
             |  WHERE o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey
             |  LIMIT 2) o
             |WHERE c.c_mktsegment = 'AUTOMOBILE'
             |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),

    // ------------------------------------------- TPC-H Q5 (SQL surface)
    // Six-table join (the full snowflake) + one-year filter + per-nation
    // revenue. Catalyst picks the join order and broadcasts every
    // dimension; only orders⋈lineitem shuffles.
    QueryDef(
      "q05_sql_tpch_q5",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
          .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(s"${n}_v5"))
        s.sql("""
          SELECT n_name,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
          FROM customer_v5 JOIN orders_v5   ON c_custkey = o_custkey
                           JOIN lineitem_v5 ON l_orderkey = o_orderkey
                           JOIN supplier_v5 ON l_suppkey = s_suppkey
                                           AND c_nationkey = s_nationkey
                           JOIN nation_v5   ON s_nationkey = n_nationkey
                           JOIN region_v5   ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01'
          GROUP BY n_name
          ORDER BY revenue DESC, n_name""")
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders   ON c_custkey = o_custkey
             |              JOIN lineitem ON l_orderkey = o_orderkey
             |              JOIN supplier ON l_suppkey = s_suppkey
             |                           AND c_nationkey = s_nationkey
             |              JOIN nation   ON s_nationkey = n_nationkey
             |              JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // ------------------------------------------ TPC-H Q10 (SQL surface)
    // Returned-item reporting: top-20 customers by lost revenue in a
    // quarter — join + filter + aggregate + top-k in one statement.
    QueryDef(
      "q05_sql_tpch_q10",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "nation")
          .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(s"${n}_v10"))
        s.sql("""
          SELECT c_custkey, c_name,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
                 n_name
          FROM customer_v10 JOIN orders_v10   ON c_custkey = o_custkey
                            JOIN lineitem_v10 ON l_orderkey = o_orderkey
                            JOIN nation_v10   ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1996-04-01'
            AND l_returnflag = 'R'
          GROUP BY c_custkey, c_name, n_name
          ORDER BY revenue DESC, c_custkey
          LIMIT 20""")
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
             |  n_name
             |FROM customer JOIN orders   ON c_custkey = o_custkey
             |              JOIN lineitem ON l_orderkey = o_orderkey
             |              JOIN nation   ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate <  TIMESTAMP '1996-04-01'
             |  AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey
             |LIMIT 20""".stripMargin)),

    // ------------------------------------------- TPC-H Q7 (SQL surface)
    // Volume shipping between two nations: the classic two-role join
    // (supplier nation x customer nation) with a disjunctive nation
    // predicate and per-year revenue. Catalyst pushes the nation filter
    // below the join through the OR once both sides are joined to the
    // (broadcast) nation dim.
    QueryDef(
      "q05_sql_tpch_q7",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "supplier", "nation")
          .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(s"${n}_v7"))
        s.sql("""
          SELECT supp_nation, cust_nation, l_year,
                 CAST(SUM(CAST(volume AS DECIMAL(27,4))) AS DOUBLE) AS revenue
          FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier_v7 JOIN lineitem_v7 ON s_suppkey = l_suppkey
                             JOIN orders_v7   ON o_orderkey = l_orderkey
                             JOIN customer_v7 ON c_custkey = o_custkey
                             JOIN nation_v7 n1 ON s_nationkey = n1.n_nationkey
                             JOIN nation_v7 n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
          ) shipping
          GROUP BY supp_nation, cust_nation, l_year
          ORDER BY supp_nation, cust_nation, l_year""")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(SUM(CAST(volume AS DECIMAL(27,4))) AS DOUBLE) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |         l_extendedprice * (1 - l_discount) AS volume
             |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             |                JOIN orders   ON o_orderkey = l_orderkey
             |                JOIN customer ON c_custkey = o_custkey
             |                JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |                JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
             |) shipping
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ------------------------------------------ TPC-H Q18 (SQL surface)
    // Large-volume orders: group-by-HAVING subquery feeding an IN
    // predicate. Catalyst plans the IN as a left-semi join against the
    // (re)aggregated lineitem — two aggregations over the same shuffle
    // key, the second reusing the first's exchange.
    QueryDef(
      "q05_sql_tpch_q18",
      (s, dir) => {
        Seq("customer", "orders", "lineitem")
          .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(s"${n}_v18"))
        s.sql("""
          SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS total_qty
          FROM customer_v18 JOIN orders_v18   ON c_custkey = o_custkey
                            JOIN lineitem_v18 ON o_orderkey = l_orderkey
          WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem_v18
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
          GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 100""")
      },
      Some("""SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS total_qty
             |FROM customer JOIN orders   ON c_custkey = o_custkey
             |              JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey IN (
             |  SELECT l_orderkey FROM lineitem
             |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
             |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 100""".stripMargin)),

    // ------------------------ custom physical operator: interval join
    // Broadcast point-in-interval join through the full custom-operator
    // stack (plans.IntervalJoin: logical node -> SparkStrategy ->
    // BinaryExecNode with a broadcast-distribution requirement). Each
    // event is matched to its type's half-hour-after-the-hour windows —
    // the SCD2/config-epoch lookup shape that Catalyst would otherwise
    // plan as a broadcast NESTED-LOOP join (containment has no equi-key;
    // RangeJoinRule's bucketing needs a fixed width, a dimension of
    // arbitrary-width intervals doesn't). The exec probes a per-key
    // lo-sorted binary-searchable index instead: O(log n + matches) per
    // event, probe side never shuffles. Child session isolates the
    // injected strategy; IntervalJoinSpec covers overlap/null/type edges.
    QueryDef(
      "q07_interval_join",
      (s, dir) => {
        val child = s.newSession()
        graft.plans.IntervalJoin.install(child)
        val e = Tables.load(child, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"))
        val dim = e
          .groupBy(col("event_type").as("d_type"),
            date_trunc("hour", col("ts")).as("lo"))
          .agg(count(lit(1)).as("n_in_hour"))
          .withColumn("hi", col("lo") + expr("INTERVAL 30 MINUTE"))
        graft.plans.IntervalJoin
          .pointInInterval(e, dim, "ts", "lo", "hi",
            probeKeys = Seq("event_type"), buildKeys = Seq("d_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_in_window"))
          .orderBy("event_type")
      },
      Some("""WITH dim AS (
             |  SELECT event_type AS d_type, date_trunc('hour', ts) AS lo,
             |         date_trunc('hour', ts) + INTERVAL 30 MINUTE AS hi
             |  FROM events GROUP BY 1, 2)
             |SELECT e.event_type AS event_type, count(*) AS n_in_window
             |FROM events e JOIN dim d
             |  ON e.event_type = d.d_type AND d.lo <= e.ts AND e.ts < d.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ----------------------- natural-SQL containment join, auto-rewritten
    // The same interval join written as PLAIN SQL — no operator API. With
    // plans.IntervalJoinRule installed (IntervalJoin.install /
    // GraftExtensions), the `key = key AND p >= lo AND p < hi` condition
    // against a broadcastable dimension is detected in the optimizer and
    // swapped for PointInIntervalJoinExec; without it, Catalyst plans a
    // broadcast nested loop. IntervalJoinRuleSpec asserts the rewrite
    // fires, is exact vs the unrewritten join, and leaves non-containment
    // joins alone.
    QueryDef(
      "q07_interval_sql",
      (s, dir) => {
        val child = s.newSession()
        graft.plans.IntervalJoin.install(child)
        val e = Tables.load(child, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"))
        e.createOrReplaceTempView("events_iv")
        e.groupBy(col("event_type").as("d_type"),
            date_trunc("hour", col("ts")).as("lo"))
          .agg(count(lit(1)).as("n_in_hour"))
          .withColumn("hi", col("lo") + expr("INTERVAL 30 MINUTE"))
          .createOrReplaceTempView("dim_iv")
        child.sql("""
          SELECT e.event_type AS event_type, count(*) AS n_in_window
          FROM events_iv e JOIN dim_iv d
            ON e.event_type = d.d_type AND e.ts >= d.lo AND e.ts < d.hi
          GROUP BY 1 ORDER BY 1""")
      },
      Some("""WITH dim AS (
             |  SELECT event_type AS d_type, date_trunc('hour', ts) AS lo,
             |         date_trunc('hour', ts) + INTERVAL 30 MINUTE AS hi
             |  FROM events GROUP BY 1, 2)
             |SELECT e.event_type AS event_type, count(*) AS n_in_window
             |FROM events e JOIN dim d
             |  ON e.event_type = d.d_type AND e.ts >= d.lo AND e.ts < d.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --------------------------------- optimizer-rule-rewritten range join
    // The NAIVE SQL form of q07_join_range — no hand-bucketing — executed
    // with plans.RangeJoinRule installed, which rewrites the bounded
    // interval predicate into the bucketed equi-join automatically (the
    // same plan q07_join_range builds by hand). Runs in a child session so
    // the installed rule can't leak into the other queries' plans;
    // RangeJoinRuleSpec asserts the rewrite fires and is exact.
    QueryDef(
      "q07_range_rule",
      (s, dir) => {
        val child = s.newSession()
        child.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRule)
        Tables.load(child, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"))
          .createOrReplaceTempView("events_rr")
        child.sql("""
          SELECT a.event_type AS event_type, count(*) AS n_pairs
          FROM events_rr a JOIN events_rr b
            ON a.event_type = b.event_type
           AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
          GROUP BY 1 ORDER BY 1""")
      },
      Some("""SELECT a.event_type AS event_type, count(*) AS n_pairs
             |FROM events a JOIN events b
             |  ON a.event_type = b.event_type
             | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ----------------------- materialized-summary rewrite (q74)
    // The warehouse accelerator as a Catalyst rule: a pre-computed
    // summary cube over lineitem (dims × {cnt, sum_, min_, max_}) is
    // registered with plans.SummaryRewriteRule, and the NAIVE aggregate
    // over the FACT table — grouping by a strict SUBSET of the summary
    // dims, so the rollup re-aggregation path is exercised — is
    // optimizer-rewritten to read the summary instead. PLAN-REQUIRED:
    // the query throws unless the optimized plan scans the summary and
    // does NOT scan the fact. Measures are integer-exact (long sum,
    // double min/max) so the two-level aggregation is order-free and
    // oracle-hashable. Runs on a child session (the rule is an opt-in:
    // a summary is only as fresh as its build job). At 100 TB this is
    // the difference between reading the cube and re-scanning the fact
    // per dashboard query.
    QueryDef(
      "q74_mv_rewrite",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val factPath = s"$dir/lineitem.parquet"
        val sumPath = ensureQ74Summary(s, dir)
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(sumPath,
            dims = Set("l_returnflag", "l_linestatus", "l_linenumber"),
            measures = Set("l_partkey", "l_quantity")))
        val child = s.newSession()
        child.experimental.extraOptimizations =
          Seq(graft.plans.SummaryRewriteRule)
        val df = child.read.parquet(factPath)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_partkey")).as("sum_pk"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy("l_returnflag", "l_linestatus")
        val scanned = scannedPaths(df)
        require(scanned.exists(_.contains("graft_q74_summary")),
          s"summary rewrite did not fire; scans: $scanned")
        require(!scanned.exists(_.contains("lineitem")),
          s"rewritten plan still scans the fact table: $scanned")
        df
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  count(*) AS n_rows,
             |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
             |  min(l_quantity) AS min_qty,
             |  max(l_quantity) AS max_qty
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ------------------ summary rewrite under a dims-only filter (q74b)
    // The dashboard shape proper: `WHERE <dim> = … GROUP BY <other dims>`.
    // A dims-only predicate keeps or drops WHOLE summary groups, so the
    // pre-aggregated values remain exact under it and the rule pushes
    // the filter onto the summary scan; a measure-column predicate
    // slices within groups and must decline (the negative case is
    // spec-pinned in SummaryRewriteRuleSpec). Same plan requirement as
    // q74: summary scanned, fact NOT scanned.
    QueryDef(
      "q74_mv_rewrite_dimfilter",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val factPath = s"$dir/lineitem.parquet"
        val sumPath = ensureQ74Summary(s, dir)
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(sumPath,
            dims = Set("l_returnflag", "l_linestatus", "l_linenumber"),
            measures = Set("l_partkey", "l_quantity")))
        val child = s.newSession()
        child.experimental.extraOptimizations =
          Seq(graft.plans.SummaryRewriteRule)
        val df = child.read.parquet(factPath)
          .filter(col("l_returnflag") === "A" && col("l_linenumber") <= 4)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_partkey")).as("sum_pk"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy("l_linestatus")
        val scanned = scannedPaths(df)
        require(scanned.exists(_.contains("graft_q74_summary")),
          s"summary rewrite did not fire under the dims filter; scans: $scanned")
        require(!scanned.exists(_.contains("lineitem")),
          s"rewritten plan still scans the fact table: $scanned")
        df
      },
      Some("""SELECT l_linestatus,
             |  count(*) AS n_rows,
             |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
             |  max(l_quantity) AS max_qty
             |FROM lineitem
             |WHERE l_returnflag = 'A' AND l_linenumber <= 4
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --------------- summary rewrite OVER A STAR JOIN (q79)
    // The flagship dashboard shape: aggregate the fact JOINED to a
    // dimension table, grouping by DIM columns. Eligible when every
    // join conjunct equates a summary DIM with a dim-side column: then
    // summary groups are key-homogeneous, so the inner join drops and
    // replicates group rows exactly as it would the underlying fact
    // rows (drops are whole-group; an m-way key match replicates
    // partial sums and cnt m times, matching m-way fact-row
    // duplication; min/max are replication-invariant). The rewrite
    // joins the SUMMARY to the untouched dim side — at 100 TB the
    // dashboard's fact scan becomes a cube-times-dim broadcast join.
    // PLAN-REQUIRED: summary scanned, fact NOT scanned, supplier still
    // scanned. Aggregates over DIM columns are ineligible and decline
    // (spec-pinned negative in SummaryRewriteRuleSpec).
    QueryDef(
      "q79_mv_rewrite_join",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val factPath = s"$dir/lineitem.parquet"
        val sumPath = graft.RunPaths.scratch(
          "graft_q79_summary_" + graft.RunPaths.keyFor(dir))
        s.read.parquet(factPath)
          .groupBy(col("l_suppkey"), col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_partkey")).as("sum_l_partkey"),
            min(col("l_quantity")).as("min_l_quantity"),
            max(col("l_quantity")).as("max_l_quantity"))
          .write.mode("overwrite").parquet(sumPath)
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(sumPath,
            dims = Set("l_suppkey", "l_returnflag"),
            measures = Set("l_partkey", "l_quantity")))
        val child = s.newSession()
        child.experimental.extraOptimizations =
          Seq(graft.plans.SummaryRewriteRule)
        val supplier = Tables.load(child, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val df = child.read.parquet(factPath)
          .filter(col("l_returnflag") === "A")
          .join(supplier, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_partkey")).as("sum_pk"),
            min(col("l_quantity")).as("min_qty"))
          .orderBy("s_nationkey")
        val scanned = scannedPaths(df)
        // any registered summary, not specifically q79's: the catalog
        // ACCUMULATES cubes per fact (r11 best-match routing), q80
        // registers an identically-dimensioned cube for lineitem in
        // the same JVM, and equal-width ties route to the most recent
        // registration — either cube is exact for this query, so the
        // plan requirement is "a summary, never the fact"
        require(scanned.exists(_.contains("_summary_")),
          s"star-join summary rewrite did not fire; scans: $scanned")
        require(!scanned.exists(_.contains("lineitem")),
          s"rewritten plan still scans the fact table: $scanned")
        require(scanned.exists(_.contains("supplier")),
          s"dim side must remain a real scan: $scanned")
        df
      },
      Some("""SELECT s_nationkey,
             |  count(*) AS n_rows,
             |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
             |  min(l_quantity) AS min_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE l_returnflag = 'A'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------- summary rewrite through a SNOWFLAKE chain (q80)
    // Two join levels: lineitem ⋈ supplier (fact-dim equi on a summary
    // dim) ⋈ nation (a dim-to-dim link that references NO fact column
    // and must pass through untouched). The rule walks the join chain
    // to the fact (through the pruning Projects Catalyst plants between
    // nested joins), substitutes the summary at the leaf, and rebuilds
    // the chain — the TPC-H-Q5-style dashboard reads cube ⋈ supplier ⋈
    // nation instead of scanning the fact. PLAN-REQUIRED: summary +
    // supplier + nation scanned, lineitem not.
    QueryDef(
      "q80_mv_rewrite_snowflake",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val factPath = s"$dir/lineitem.parquet"
        val sumPath = graft.RunPaths.scratch(
          "graft_q80_summary_" + graft.RunPaths.keyFor(dir))
        s.read.parquet(factPath)
          .groupBy(col("l_suppkey"), col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_partkey")).as("sum_l_partkey"),
            min(col("l_quantity")).as("min_l_quantity"),
            max(col("l_quantity")).as("max_l_quantity"))
          .write.mode("overwrite").parquet(sumPath)
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(sumPath,
            dims = Set("l_suppkey", "l_returnflag"),
            measures = Set("l_partkey", "l_quantity")))
        val child = s.newSession()
        child.experimental.extraOptimizations =
          Seq(graft.plans.SummaryRewriteRule)
        val supplier = Tables.load(child, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nation = Tables.load(child, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val df = child.read.parquet(factPath)
          .filter(col("l_returnflag") === "A")
          .join(supplier, col("l_suppkey") === col("s_suppkey"))
          .join(nation, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_partkey")).as("sum_pk"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy("n_name")
        val scanned = scannedPaths(df)
        // "_summary_", not q80's own path — see q79's comment (the
        // accumulating catalog may serve this query from q79's
        // identically-dimensioned cube; both are exact)
        require(scanned.exists(_.contains("_summary_")),
          s"snowflake summary rewrite did not fire; scans: $scanned")
        require(!scanned.exists(_.contains("lineitem")),
          s"rewritten plan still scans the fact table: $scanned")
        require(scanned.exists(_.contains("supplier")) &&
          scanned.exists(_.contains("nation")),
          s"both dim scans must remain: $scanned")
        df
      },
      Some("""SELECT n_name,
             |  count(*) AS n_rows,
             |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
             |  max(l_quantity) AS max_qty
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE l_returnflag = 'A'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Best-match summary selection (r11): a fact carries SEVERAL
    // registered cubes and each query must route to the SMALLEST one
    // whose dims cover its needs — the multi-cube warehouse shape
    // (register a handful of cubes, every dashboard query picks its
    // cheapest exact answer). Two cubes over orders: coarse
    // {o_orderstatus} and finer {o_orderstatus, o_orderpriority}. One
    // plan computes both a per-(status, priority) aggregate and a
    // per-status total; PLAN-REQUIRED: the finer aggregate reads the
    // finer cube, the coarser aggregate reads the coarse cube (NOT the
    // finer one it is also exactly answerable from — fewer dims =
    // fewer rows = cheaper), and the orders fact is never scanned.
    QueryDef(
      "q83_mv_bestmatch",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val factPath = s"$dir/orders.parquet"
        // own the fact's catalog state (q85 registers orders cubes too;
        // each query's routing contract assumes only its own cubes)
        graft.plans.SummaryRewriteRule.unregister(factPath)
        val coarsePath = graft.RunPaths.scratch(
          "graft_q83_cube_coarse_" + graft.RunPaths.keyFor(dir))
        val finePath = graft.RunPaths.scratch(
          "graft_q83_cube_fine_" + graft.RunPaths.keyFor(dir))
        val orders = s.read.parquet(factPath)
        orders.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_custkey")).as("sum_o_custkey"))
          .write.mode("overwrite").parquet(coarsePath)
        orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_custkey")).as("sum_o_custkey"))
          .write.mode("overwrite").parquet(finePath)
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(coarsePath,
            dims = Set("o_orderstatus"), measures = Set("o_custkey"),
            rows = Some(s.read.parquet(coarsePath).count())))
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(finePath,
            dims = Set("o_orderstatus", "o_orderpriority"),
            measures = Set("o_custkey"),
            rows = Some(s.read.parquet(finePath).count())))
        val child = s.newSession()
        child.experimental.extraOptimizations =
          Seq(graft.plans.SummaryRewriteRule)
        // two separate reads (distinct attribute ids), and the coarse
        // side renames AFTER aggregating: an aliased grouping column
        // would be an ineligible shape for the rewrite by design
        val fine = child.read.parquet(factPath)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_custkey")).as("sum_ck"))
        val coarse = child.read.parquet(factPath)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("status_rows"))
          .withColumnRenamed("o_orderstatus", "cs")
        val df = fine
          .join(coarse, col("o_orderstatus") === col("cs"))
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("n_rows"), col("sum_ck"), col("status_rows"))
          .orderBy("o_orderstatus", "o_orderpriority")
        val scanned = scannedPaths(df)
        require(scanned.exists(_.contains("graft_q83_cube_fine")),
          s"finer aggregate did not route to the finer cube: $scanned")
        require(scanned.exists(_.contains("graft_q83_cube_coarse")),
          s"coarser aggregate did not route to the coarse cube: $scanned")
        require(!scanned.exists(_.contains("orders")),
          s"rewritten plan still scans the fact table: $scanned")
        df
      },
      Some("""WITH fine AS (
             |  SELECT o_orderstatus, o_orderpriority,
             |         count(*) AS n_rows,
             |         CAST(sum(o_custkey) AS BIGINT) AS sum_ck
             |  FROM orders GROUP BY 1, 2),
             |coarse AS (
             |  SELECT o_orderstatus, count(*) AS status_rows
             |  FROM orders GROUP BY 1)
             |SELECT f.o_orderstatus, f.o_orderpriority, f.n_rows,
             |       f.sum_ck, c.status_rows
             |FROM fine f JOIN coarse c USING (o_orderstatus)
             |ORDER BY 1, 2""".stripMargin)),

    // Cost-based cube routing (r11): dim-set width is only a SIZE
    // PROXY, and it mispicks exactly where dim sets are incomparable —
    // a GLOBAL aggregate is answerable from both a high-cardinality
    // 1-dim cube (~150 rows: per-customer) and a tiny 2-dim cube
    // (~15 rows: status × priority), and fewest-dims would read the
    // big one. Cubes registered with their MEASURED row count (one
    // tiny count at registration — a summary is small by contract)
    // route by actual size. PLAN-REQUIRED: the global aggregate reads
    // the measured-smallest cube; neither the wide cube nor the fact
    // is scanned.
    QueryDef(
      "q85_mv_costroute",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val factPath = s"$dir/orders.parquet"
        // own the fact's catalog state: rows-ordering engages only when
        // EVERY registered cube carries a measured count
        graft.plans.SummaryRewriteRule.unregister(factPath)
        val widePath = graft.RunPaths.scratch(
          "graft_q85_cube_wide_" + graft.RunPaths.keyFor(dir))
        val tinyPath = graft.RunPaths.scratch(
          "graft_q85_cube_tiny_" + graft.RunPaths.keyFor(dir))
        val orders = s.read.parquet(factPath)
        orders.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("sum_o_orderkey"))
          .write.mode("overwrite").parquet(widePath)
        orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_orderkey")).as("sum_o_orderkey"))
          .write.mode("overwrite").parquet(tinyPath)
        val nWide = s.read.parquet(widePath).count()
        val nTiny = s.read.parquet(tinyPath).count()
        require(nWide > nTiny,
          s"q85 fixture must be a real mispick: wide=$nWide tiny=$nTiny")
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(widePath,
            dims = Set("o_custkey"), measures = Set("o_orderkey"),
            rows = Some(nWide)))
        graft.plans.SummaryRewriteRule.register(factPath,
          graft.plans.SummaryRewriteRule.SummaryDef(tinyPath,
            dims = Set("o_orderstatus", "o_orderpriority"),
            measures = Set("o_orderkey"), rows = Some(nTiny)))
        val child = s.newSession()
        child.experimental.extraOptimizations =
          Seq(graft.plans.SummaryRewriteRule)
        val df = child.read.parquet(factPath)
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_orderkey")).as("sum_ok"))
        val scanned = scannedPaths(df)
        require(scanned.exists(_.contains("graft_q85_cube_tiny")),
          s"global aggregate did not route to the measured-smallest " +
            s"cube: $scanned")
        require(!scanned.exists(_.contains("graft_q85_cube_wide")),
          s"routing read the WIDE cube — width proxy, not measured " +
            s"rows: $scanned")
        require(!scanned.exists(_.contains("orders")),
          s"rewritten plan still scans the fact table: $scanned")
        df
      },
      Some("""SELECT count(*) AS n_orders,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
             |FROM orders""".stripMargin)),

    // -------------------------------------- registered SQL functions
    // The custom Catalyst expressions exposed through the SQL surface
    // (GraftFunctions.register / GraftExtensions): the same codegen'd
    // expressions, reachable from spark.sql. Oracle: the fingerprint is
    // collision-free on the corpus (asserted in LlmOpsSpec), so its
    // distinct count equals DISTINCT text; the shingle count has a direct
    // DuckDB replica.
    QueryDef(
      "q21_sql_functions",
      (s, dir) => {
        graft.GraftFunctions.register(s)
        Tables.load(s, dir, "documents").createOrReplaceTempView("documents_fn")
        s.sql("""
          SELECT lang,
                 count(DISTINCT graft_rolling_hash64(text)) AS n_distinct_fp,
                 CAST(sum(size(graft_word_shingles(text, 3))) AS BIGINT) AS total_shingles
          FROM documents_fn
          GROUP BY lang ORDER BY lang""")
      },
      Some("""WITH d AS (SELECT lang, text, string_split(text, ' ') AS w FROM documents)
             |SELECT lang, count(DISTINCT text) AS n_distinct_fp,
             |  CAST(sum(CASE WHEN len(w) >= 3
             |    THEN len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                            FOR i IN range(1, greatest(len(w)-1, 1))]))
             |    ELSE 0 END) AS BIGINT) AS total_shingles
             |FROM d GROUP BY lang ORDER BY lang""".stripMargin)),

    // ------------------------------------------------ CDC merge/upsert
    // Snapshot maintenance (operators/MergeUpsert): an updates batch
    // (price corrections for key%100=0, new rows cloned to key+10M for
    // key%97=3) merged latest-wins into orders, then checksummed. The
    // +1000.0 delta keeps prices exact 2-decimal values so the DECIMAL
    // sum stays order-independent on both engines.
    QueryDef(
      "q33_merge_upsert",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val base = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val updates = base.filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .unionByName(base.filter(col("o_orderkey") % 97 === 3)
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
        graft.operators.MergeUpsert.upsert(base, updates, Seq("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
             |updates AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
             |  FROM base WHERE o_orderkey % 100 = 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
             |  FROM base WHERE o_orderkey % 97 = 3),
             |merged AS (
             |  SELECT * FROM updates
             |  UNION ALL
             |  SELECT * FROM base b
             |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = b.o_orderkey))
             |SELECT o_orderstatus, count(*) AS n_rows,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
             |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ----------------------------------- SCD type-2 dimension history
    // Slowly-changing-dimension build from an event log: collapse each
    // user's event stream to its attribute CHANGE points (lag over the
    // per-user window), then derive validity intervals (lead). The
    // canonical warehouse history-table shape: one window partition per
    // key — shuffle on user_id only, no self-join — and the interval
    // derivation composes with AsOfJoin for point-in-time lookups.
    QueryDef(
      "q33_scd2",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val changes = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        val w2 = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        // Open-interval sentinel must stay inside pandas' datetime64[ns]
        // range (max 2262-04-11): the driver's hash path round-trips both
        // engines' results through pandas, and an out-of-range timestamp
        // (e.g. the classic 9999-12-31) is mangled differently per engine.
        changes
          .withColumn("valid_to",
            coalesce(lead(col("ts"), 1).over(w2),
              lit("2200-01-01 00:00:00").cast("timestamp")))
          .select(col("user_id"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"),
            (col("valid_to") === lit("2200-01-01 00:00:00").cast("timestamp"))
              .as("is_current"))
          .orderBy("user_id", "valid_from", "event_type")
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |changes AS (
             |  SELECT user_id, event_type, ts, event_id FROM ordered
             |  WHERE prev_type IS NULL OR prev_type <> event_type)
             |SELECT user_id, event_type, ts AS valid_from,
             |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |           TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
             |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |           TIMESTAMP '2200-01-01 00:00:00') = TIMESTAMP '2200-01-01 00:00:00'
             |    AS is_current
             |FROM changes ORDER BY user_id, valid_from, event_type""".stripMargin)),

    // ----------------------------------------- batch sessionization
    // Gap-based sessionization of the event log (30-minute inactivity
    // boundary): lag over the per-user window flags session starts, a
    // running sum of flags numbers the sessions, then one aggregate per
    // (user, session). Gap arithmetic is integer MICROSECONDS
    // (unix_micros / epoch_us) so the boundary decision is exact in both
    // engines — double epoch seconds would be rounding-fragile. Scale:
    // ONE shuffle on user_id; the window sort and the final aggregate
    // reuse the same partitioning (HashPartitioning(user_id) satisfies
    // the (user_id, session_id) clustering), so sessionizing 100 TB of
    // events costs a single exchange + per-partition sorts.
    QueryDef(
      "q34_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(w))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            min(col("ts")).as("session_start"),
            count(lit(1)).as("n_events"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"),
            sum(col("value").cast(DecimalType(27, 6))).cast("double")
              .as("session_value"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, ts, event_id, value,
             |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |flagged AS (
             |  SELECT *, CASE WHEN prev_us IS NULL
             |                   OR epoch_us(ts) - prev_us > 1800 * 1000000
             |                 THEN 1 ELSE 0 END AS new_sess
             |  FROM ordered),
             |numbered AS (
             |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM flagged)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  min(ts) AS session_start,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us,
             |  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS session_value
             |FROM numbered GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin))
  )
}
