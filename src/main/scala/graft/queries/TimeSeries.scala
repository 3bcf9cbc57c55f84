package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series analytics over the event log: OHLC bars, gap-filled
  * regular grids, and cumulative distinct counts — the shapes a metrics /
  * market-data / telemetry pipeline runs on the converted lake. All
  * outputs are raw values or integer counts (no float arithmetic), so the
  * DuckDB hash oracle is exact with no rounding conventions.
  */
object TimeSeries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------- OHLC bars
  // Hourly open/high/low/close per event type. Open/close are picked by
  // row_number over the (ts, event_id) order — a total order, so ties on
  // ts can't flip the answer between engines — and high/low are plain
  // min/max: the whole bar is selection, not arithmetic. One shuffle on
  // (event_type, hour); both window and aggregate reuse it. At 100 TB
  // this is the standard pre-aggregation that turns a raw tick/event log
  // into a bar table 4-6 orders of magnitude smaller.
  private def ohlcQ: QueryDef = QueryDef(
    "q42_ohlc_bars",
    (s, dir) => {
      val base = t(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
          col("value"), col("ts"), col("event_id"))
      val wAsc = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wDesc = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("ts").desc, col("event_id").desc)
      base
        .withColumn("rn_a", row_number().over(wAsc))
        .withColumn("rn_d", row_number().over(wDesc))
        .groupBy("event_type", "h")
        .agg(
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type", "h")
    },
    Some("""WITH b AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h, value,
           |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
           |      ORDER BY ts ASC, event_id ASC) AS rn_a,
           |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
           |      ORDER BY ts DESC, event_id DESC) AS rn_d
           |  FROM events)
           |SELECT event_type, h,
           |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
           |  max(value) AS high,
           |  min(value) AS low,
           |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
           |  count(*) AS n_events
           |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------- gap filling
  // Hourly event counts per type on a COMPLETE hour spine — empty hours
  // appear with 0, which downstream alerting/forecasting requires. The
  // spine is generated (sequence over the corpus hour range crossed with
  // the type dimension), never collected: spine size = hours × types, a
  // derived-dimension cross join that stays tiny relative to the log
  // (720 × 5 here; even a decade of seconds × 10k series is ~3×10¹²
  // spine rows — at that point the spine itself partitions by time
  // range, same plan shape). Counts ride a left join keyed by
  // (type, hour).
  private def gapfillQ: QueryDef = QueryDef(
    "q42_gapfill",
    (s, dir) => {
      val e = t(s, dir, "events")
      val bounds = e.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val types = e.select(col("event_type")).distinct()
      val counts = e
        .groupBy(col("event_type").as("c_type"),
          date_trunc("hour", col("ts")).as("c_h"))
        .agg(count(lit(1)).as("n"))
      spine.crossJoin(types)
        .join(counts,
          col("event_type") === col("c_type") && col("h") === col("c_h"),
          "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy("event_type", "h")
    },
    Some("""WITH bounds AS (
           |  SELECT date_trunc('hour', min(ts)) AS lo,
           |         date_trunc('hour', max(ts)) AS hi FROM events),
           |spine AS (
           |  SELECT unnest(generate_series(
           |    (SELECT lo FROM bounds), (SELECT hi FROM bounds),
           |    INTERVAL 1 HOUR)) AS h),
           |types AS (SELECT DISTINCT event_type FROM events),
           |c AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
           |      FROM events GROUP BY 1, 2)
           |SELECT t.event_type, s.h, coalesce(c.n, 0) AS n_events
           |FROM spine s CROSS JOIN types t
           |LEFT JOIN c ON c.event_type = t.event_type AND c.h = s.h
           |ORDER BY t.event_type, s.h""".stripMargin))

  // ------------------------------------------- cumulative distinct users
  // Daily new-user counts and the running total of distinct users ever
  // seen — the growth-curve query. Exact cumulative distincts without
  // per-day re-distincting: reduce each user to their FIRST day (one
  // aggregate keyed by user), count by day, running-sum the counts.
  // The running sum at the end runs over days, not users — a few
  // thousand rows even for a decade — so the expensive part is exactly
  // one user-keyed aggregate over the log. The prefix sum itself goes
  // through GlobalIndex.withRunningTotal (range shuffle + per-partition
  // scan + ≤numPartitions-row offset window) rather than a
  // partition-less SQL window: provably distributed at ANY day count,
  // which also keeps the registry-wide WindowGuard sweep whitelist-free
  // for this query.
  private def cumUniquesQ: QueryDef = QueryDef(
    "q42_cum_uniques",
    (s, dir) => {
      val firstSeen = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("first_day"))
      val daily = firstSeen.groupBy("first_day")
        .agg(count(lit(1)).as("n_new"))
      graft.operators.GlobalIndex.withRunningTotal(
          daily, Seq(col("first_day")), "n_new", "_cu_pos", "cum_users", 8)
        .select(col("first_day"), col("n_new"), col("cum_users"))
        .orderBy("first_day")
    },
    Some("""WITH fs AS (
           |  SELECT user_id, date_trunc('day', min(ts)) AS first_day
           |  FROM events GROUP BY 1),
           |d AS (SELECT first_day, count(*) AS n_new FROM fs GROUP BY 1)
           |SELECT first_day, n_new,
           |  CAST(sum(n_new) OVER (ORDER BY first_day
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
           |FROM d ORDER BY first_day""".stripMargin))

  // ------------------------------------------- rolling time-range window
  // 7-day trailing event value per type: a RANGE frame over day numbers
  // (not ROWS — missing days must still shrink the window), computed on
  // the pre-aggregated daily table so the window runs over days × types,
  // not raw events. Sums ride DECIMAL. The two-level shape — aggregate
  // to the grain first, window second — is what keeps rolling metrics
  // affordable at 100 TB: the expensive pass is one keyed aggregate, and
  // the window input is maximally reduced.
  private def rolling7dQ: QueryDef = QueryDef(
    "q42_rolling_7d",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(27, 6))).as("day_value"),
          count(lit(1)).as("n_events"))
        .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("day_num")).rangeBetween(-6, 0)
      daily
        .select(col("event_type"), col("day"),
          sum(col("day_value")).over(w).cast("double").as("value_7d"),
          sum(col("n_events")).over(w).as("events_7d"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |         sum(CAST(value AS DECIMAL(27,6))) AS day_value,
           |         count(*) AS n_events,
           |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
           |           AS day_num
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, day,
           |  CAST(sum(day_value) OVER w AS DOUBLE) AS value_7d,
           |  CAST(sum(n_events) OVER w AS BIGINT) AS events_7d
           |FROM daily
           |WINDOW w AS (PARTITION BY event_type ORDER BY day_num
           |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           |ORDER BY event_type, day""".stripMargin))

  // ------------------------------------------------- retention cohorts
  // Weekly cohort retention: users grouped by first-seen week, activity
  // counted per (cohort, weeks-since-cohort) — the table behind every
  // retention curve. Two aggregates: first-seen per user (keyed by
  // user), then activity joined back to the cohort assignment (keyed by
  // user again — the SAME partitioning, so at scale the join is
  // co-partitioned with the first aggregate's output and the log is
  // scanned twice, shuffled on user_id twice, nothing else). Week
  // arithmetic is integer days/7 from a fixed Monday epoch — exact in
  // both engines.
  private def retentionQ: QueryDef = QueryDef(
    "q42_retention",
    (s, dir) => {
      // 1970-01-05 is a Monday: week = floordiv(days since it, 7)
      val week = (c: org.apache.spark.sql.Column) =>
        floor(datediff(to_date(c), lit("1970-01-05")) / 7).cast("long")
      val e = t(s, dir, "events").select(col("user_id"), col("ts"))
      val cohorts = e.groupBy("user_id")
        .agg(min(week(col("ts"))).as("cohort_week"))
      e.select(col("user_id"), week(col("ts")).as("act_week"))
        .distinct()
        .join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (col("act_week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH wk AS (
           |  SELECT user_id,
           |    CAST(floor(datediff('day', DATE '1970-01-05', CAST(ts AS DATE))
           |         / 7.0) AS BIGINT) AS w
           |  FROM events),
           |cohorts AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1),
           |activity AS (SELECT DISTINCT user_id, w AS act_week FROM wk)
           |SELECT c.cohort_week, a.act_week - c.cohort_week AS week_offset,
           |       count(*) AS n_active_users
           |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ------------------------------------------- distribution drift (PSI)
  // Population stability index of the value distribution, early half vs
  // late half of the month, per event type — the drift monitor an ML
  // pipeline runs between a reference window and production. Buckets
  // are FIXED edges (0,50,...,450,∞), not quantiles: integer bucketing
  // keeps both engines' counts identical (quantile edges would differ
  // by ulps and flip edge rows), and fixed edges are what a monitor
  // uses anyway (the reference window defines them once). PSI sums ten
  // deterministic double terms; round(6) absorbs ordering ulps. Two
  // aggregates keyed by (type, half, bucket) — one scan, one shuffle —
  // then a driver-free pivot-join of the two halves' distributions.
  // Laplace-style +1 smoothing keeps empty buckets finite.
  private def driftQ: QueryDef = QueryDef(
    "q29_drift_psi",
    (s, dir) => {
      val e = t(s, dir, "events")
      val half = when(to_date(col("ts")) < lit("2024-01-16"), "ref")
        .otherwise("cur")
      val bucket = least(floor(col("value") / 50).cast("long"), lit(9L))
      val counts = e.select(col("event_type"), half.as("half"),
          bucket.as("bucket"))
        .groupBy("event_type", "half", "bucket")
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("event_type", "half")
        .agg(sum(col("n")).as("tot"))
      // complete (type, half, bucket) grid so empty buckets smooth to +1
      val grid = e.select(col("event_type")).distinct()
        .crossJoin(s.range(0, 10).select(col("id").as("bucket")))
        .crossJoin(s.createDataFrame(Seq(Tuple1("ref"), Tuple1("cur")))
          .toDF("half"))
      val smoothed = grid
        .join(counts, Seq("event_type", "half", "bucket"), "left")
        .join(totals, Seq("event_type", "half"))
        .select(col("event_type"), col("half"), col("bucket"),
          ((coalesce(col("n"), lit(0L)) + lit(1.0)) /
            (col("tot") + lit(10.0))).as("p"))
      val ref = smoothed.filter(col("half") === "ref")
        .select(col("event_type"), col("bucket"), col("p").as("p_ref"))
      val cur = smoothed.filter(col("half") === "cur")
        .select(col("event_type"), col("bucket"), col("p").as("p_cur"))
      ref.join(cur, Seq("event_type", "bucket"))
        .groupBy("event_type")
        .agg(round(sum((col("p_cur") - col("p_ref")) *
          log(col("p_cur") / col("p_ref"))), 6).as("psi"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
           |  SELECT event_type,
           |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
           |         THEN 'ref' ELSE 'cur' END AS half,
           |    least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket
           |  FROM events),
           |c AS (SELECT event_type, half, bucket, count(*) AS n
           |      FROM e GROUP BY 1, 2, 3),
           |tot AS (SELECT event_type, half, sum(n) AS tot
           |        FROM c GROUP BY 1, 2),
           |grid AS (
           |  SELECT t.event_type, h.half, b.bucket
           |  FROM (SELECT DISTINCT event_type FROM e) t
           |  CROSS JOIN (SELECT unnest(['ref', 'cur']) AS half) h
           |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) b),
           |sm AS (
           |  SELECT g.event_type, g.half, g.bucket,
           |    (coalesce(c.n, 0) + 1.0) / (tot.tot + 10.0) AS p
           |  FROM grid g
           |  LEFT JOIN c ON c.event_type = g.event_type
           |    AND c.half = g.half AND c.bucket = g.bucket
           |  JOIN tot ON tot.event_type = g.event_type AND tot.half = g.half)
           |SELECT r.event_type,
           |  round(sum((cu.p - r.p) * ln(cu.p / r.p)), 6) AS psi
           |FROM sm r JOIN sm cu
           |  ON r.event_type = cu.event_type AND r.bucket = cu.bucket
           |  AND r.half = 'ref' AND cu.half = 'cur'
           |GROUP BY r.event_type
           |ORDER BY r.event_type""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    ohlcQ, gapfillQ, cumUniquesQ, rolling7dQ, retentionQ, driftQ)
}
