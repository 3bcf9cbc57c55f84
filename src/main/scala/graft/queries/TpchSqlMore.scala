package graft.queries

import org.apache.spark.sql.SparkSession

import graft.Tables

/** The remaining TPC-H query SHAPES (Q2/4/8/9/11/12/14/15/16/17/19/21/22),
  * adapted to the driver schema (TESTDATA.md has no partsupp and no
  * l_commitdate / l_receiptdate / l_shipmode / c_phone columns, so those
  * predicates are re-expressed over the available columns while keeping each
  * query's distinguishing plan shape: correlated min (Q2), correlated EXISTS
  * (Q4/Q21), two-role dimension join + market-share ratio (Q8), multi-term
  * profit expression (Q9), HAVING-scalar-subquery concentration (Q11),
  * conditional aggregation (Q12/Q14), CTE + scalar max (Q15), NOT IN +
  * count-distinct (Q16), correlated avg (Q17), disjunctive brackets (Q19),
  * and anti-join customer residue (Q22)).
  *
  * Spark and the DuckDB oracle run the IDENTICAL SQL text — the Spark side
  * only rewrites table names to per-query temp views — so there is no
  * dual-maintenance drift. Determinism per QueryDef: decimal-cast sums,
  * BIGINT casts, total ORDER BY. Scale notes sit on each query.
  */
object TpchSqlMore {

  private val tableNames =
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")

  /** Register per-query views and run the same SQL on Spark and DuckDB.
    * View suffix keeps queries isolated from other registries' views.
    */
  private def sqlBoth(name: String, sql: String, bench: Boolean = false): QueryDef =
    QueryDef(
      name,
      (s: SparkSession, dir: String) => {
        val suffix = s"_${name.stripPrefix("q05_sql_tpch_")}"
        val used = tableNames.filter(t => s"\\b$t\\b".r.findFirstIn(sql).isDefined)
        used.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t + suffix))
        s.sql(used.foldLeft(sql)((q, t) => q.replaceAll(s"\\b$t\\b", t + suffix)))
      },
      Some(sql),
      bench)

  val all: Seq[QueryDef] = Seq(

    // Q2 shape — min-cost supplier per part. The correlated min subquery
    // (equality-correlated on l_partkey) decorrelates into a partkey
    // aggregate + equi-join: one extra shuffle over lineitem, never a
    // nested loop. nation/region broadcast. DISTINCT collapses repeat
    // shipments; (s_name, p_partkey) is then a unique sort key.
    sqlBoth("q05_sql_tpch_q2",
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, l_extendedprice AS min_price
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |          JOIN supplier ON s_suppkey = l_suppkey
        |          JOIN nation   ON s_nationkey = n_nationkey
        |          JOIN region   ON n_regionkey = r_regionkey
        |WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, s_name, p_partkey
        |LIMIT 30""".stripMargin),

    // Q4 shape — priority checking. EXISTS with a correlated non-equi
    // residual (l_shipdate > o_orderdate + 60 days) plans as a left-semi
    // hash join on the orderkey with the residual filter — the date window
    // on orders pushes down to the parquet scan.
    sqlBoth("q05_sql_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // Q8 shape — national market share: two nation roles (customer-side
    // region filter, supplier-side share nation), ratio of two exact
    // decimal sums per year. All dims broadcast; the only shuffles are the
    // fact-fact joins and the final tiny group-by-year.
    sqlBoth("q05_sql_tpch_q8",
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
        |                ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)) AS vol,
        |         n2.n_name AS supp_nation
        |  FROM part JOIN lineitem  ON p_partkey = l_partkey
        |            JOIN orders    ON l_orderkey = o_orderkey
        |            JOIN customer  ON o_custkey = c_custkey
        |            JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |            JOIN region    ON n1.n_regionkey = r_regionkey
        |            JOIN supplier  ON l_suppkey = s_suppkey
        |            JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01'
        |) all_sales
        |GROUP BY o_year ORDER BY o_year""".stripMargin),

    // Q9 shape — profit by supplier nation x year. The two-term amount
    // (revenue minus a 10%-of-retail cost proxy for the missing
    // ps_supplycost) stays in exact decimals: prices/discounts are
    // 2-decimal, quantity is integral, so scales 4 and 6 are lossless and
    // the sum is order-independent.
    sqlBoth("q05_sql_tpch_q9",
      """SELECT supp_nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS supp_nation,
        |         CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))
        |           - CAST(l_quantity * p_retailprice * 0.1 AS DECIMAL(27,6)) AS amount
        |  FROM lineitem JOIN part     ON p_partkey = l_partkey
        |                JOIN supplier ON s_suppkey = l_suppkey
        |                JOIN orders   ON o_orderkey = l_orderkey
        |                JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%'
        |) profit
        |GROUP BY supp_nation, o_year ORDER BY supp_nation, o_year""".stripMargin),

    // Q11 shape — value concentration with a HAVING-style scalar subquery
    // over the same CTE. The threshold compare stays in exact decimals
    // (x2000 instead of x0.0005 so no decimal-scale rounding on either
    // engine). The CTE is evaluated twice — at scale, cache() or a temp
    // table materializes it once; correctness is unaffected.
    sqlBoth("q05_sql_tpch_q11",
      """WITH pv AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS val
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |                JOIN nation   ON s_nationkey = n_nationkey
        |                JOIN region   ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS p_key, CAST(val AS DOUBLE) AS part_value
        |FROM pv
        |WHERE val * 2000 > (SELECT SUM(val) FROM pv)
        |ORDER BY part_value DESC, p_key""".stripMargin),

    // Q12 shape — shipping-delay priority counts (conditional aggregation
    // over a fact-fact join; l_shipmode is not in the schema, so the
    // grouping key is l_returnflag and "late" is shipdate 60+ days after
    // the order date).
    sqlBoth("q05_sql_tpch_q12",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Q14 shape — promo revenue share in one month: conditional/total
    // ratio of exact decimal sums; the month filter pushes to the scan.
    sqlBoth("q05_sql_tpch_q14",
      """SELECT 100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))
        |                ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        |  AND l_shipdate <  TIMESTAMP '1997-07-01'""".stripMargin),

    // Q15 shape — top supplier by quarterly revenue: CTE + scalar max
    // subquery, equality on an exact decimal total (safe to compare).
    sqlBoth("q05_sql_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin),

    // Q16 shape — supplier diversity per part attribute, excluding a
    // supplier denylist via NOT IN (anti join). count(DISTINCT l_suppkey)
    // shuffles on the group key with distinct-aggregation — two-phase at
    // scale, no row explosion.
    sqlBoth("q05_sql_tpch_q16",
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_type <> 'PROMO' AND p_size IN (1, 14, 23, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin),

    // Q17 shape — small-quantity orders vs the per-part average. The
    // correlated avg decorrelates into a partkey aggregate + join; the
    // compare uses 5*qty < avg (exact integral LHS) instead of
    // qty < 0.2*avg so no extra rounding enters the predicate.
    sqlBoth("q05_sql_tpch_q17",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / 7.0
        |         AS avg_yearly,
        |       count(*) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND l_quantity * 5 <
        |      (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / count(*)
        |       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin),

    // Q19 shape — disjunctive bracket predicates across the join: Catalyst
    // extracts the common join key and pushes a derived OR-of-brands filter
    // to both scans; the brackets stay as a residual on the hash join.
    sqlBoth("q05_sql_tpch_q19",
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE)
        |         AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // Q21 shape — suppliers who were the sole returner in multi-supplier
    // orders: correlated EXISTS + NOT EXISTS on the same orderkey become a
    // left-semi and a left-anti hash join with a suppkey<>suppkey residual
    // — two shuffles of lineitem on l_orderkey, no nested loop.
    sqlBoth("q05_sql_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders    ON o_orderkey = l1.l_orderkey
        |JOIN nation    ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_5'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin),

    // Q22 shape — dormant high-balance customers by (synthetic) country
    // code: scalar avg over positive balances + NOT EXISTS recent order
    // (anti join against a date-filtered orders scan).
    sqlBoth("q05_sql_tpch_q22",
      """SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode,
        |       count(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
        |                          / count(*)
        |                   FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin),

    // Q6 shape — forecasting revenue change: single-table filtered
    // aggregate with a tight range predicate set. Every predicate pushes
    // to the parquet scan (shipdate min/max row-group skipping does the
    // heavy lifting at scale); the aggregate is a one-row partial+final
    // with no shuffle beyond the final combine. The discount product is
    // carried in DECIMAL so the sum is accumulation-order independent.
    sqlBoth("q05_sql_tpch_q6",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))
        |               * CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin),

    // Q13 shape — customer order-count distribution: LEFT OUTER join with
    // a predicate INSIDE the join condition (the reference's "special
    // requests" comment filter, re-expressed over o_orderpriority), then
    // a two-level aggregation (count per customer, then histogram of the
    // counts). The outer join keeps zero-order customers in the c_count=0
    // bucket — the shape that distinguishes Q13 from a plain join+agg.
    // Scale: customer/orders shuffle once on custkey; the second agg
    // groups on a tiny domain (distinct counts) and collapses map-side.
    sqlBoth("q05_sql_tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |       AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // Q20 shape — promotion-eligible suppliers: nested IN subqueries with
    // a correlated scalar threshold (the reference's ps_availqty > half
    // of shipped quantity, re-expressed without partsupp as "supplier
    // ships more than 20% of the part's total shipped quantity for
    // red parts"). The inner correlated sum decorrelates into a partkey
    // aggregate joined back on the group key; the IN collapses to a semi
    // join — no nested loop at any scale. nation broadcasts.
    sqlBoth("q05_sql_tpch_q20",
      """SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |  AND s_suppkey IN (
        |    SELECT l1.l_suppkey FROM lineitem l1
        |    WHERE l1.l_partkey IN (SELECT p_partkey FROM part
        |                           WHERE p_name LIKE 'red%')
        |    GROUP BY l1.l_suppkey, l1.l_partkey
        |    HAVING CAST(SUM(CAST(l1.l_quantity AS DECIMAL(27,2))) AS DOUBLE) >
        |           (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(27,2)))
        |                        AS DOUBLE) * 0.1
        |            FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_name""".stripMargin)
  )
}
