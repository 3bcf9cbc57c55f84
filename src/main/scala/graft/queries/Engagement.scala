package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral weighting over the event log — the q52 family: recency-
  * decayed activity scores (the freshness half of training-data mixture
  * weighting: recent user/source activity should count more than stale
  * activity, with a principled half-life rather than a hard cutoff) and
  * the event-type transition matrix (first-order Markov summary of
  * session behavior — the input to next-event models and to funnel
  * anomaly detection).
  *
  * Engine-exactness rule (same as q48/q50): exponential decay with a
  * one-day half-life over integer day ages is a sum of powers of two —
  * computed as BIGINT `shiftleft`, so the partial aggregate is exact
  * integer addition under ANY accumulation order, and the single final
  * division by 2^29 only rescales the exponent (no rounding beyond the
  * one deterministic int64→double conversion both engines share). No
  * `pow(0.5, x)` anywhere: float pow is the classic cross-engine
  * hash-mismatch trap. Transition probabilities are ONE division of two
  * exact counts. All ratios therefore hash-compare bit-identically in
  * DuckDB.
  */
object Engagement {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[QueryDef] = Seq(

    // ------------------------------------------ recency-decayed activity
    // Per-user activity score with a 1-day half-life over a 30-day
    // horizon: score = Σ 2^-(age_days). The horizon cap is not a
    // shortcut — beyond 30 half-lives a contribution is < 1e-9 of a
    // fresh event's — and it is what makes the integer encoding exact:
    // weight = 1L << (29 - age) is an exact BIGINT, so the sum is
    // order-independent (safe under partial aggregation / AQE) and the
    // final single division by 2^29 is a pure exponent shift.
    // Scale: the cutoff day is a one-row aggregate broadcast (no
    // driver collect); the score is ONE partial-aggregated shuffle on
    // user_id. At 100 TB this is a map-side-combined scan — the shuffle
    // carries one (user_id, sum, count) triple per user per task.
    QueryDef(
      "q52_decay_score",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("d"))
        val cutoff = ev.agg(max(col("d")).as("cd"))
        ev.crossJoin(broadcast(cutoff))
          .withColumn("age", datediff(col("cd"), col("d")))
          .filter(col("age") >= 0 && col("age") < 30)
          .withColumn("w", expr("shiftleft(1L, 29 - age)"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_recent"),
            (sum(col("w")) / lit(536870912L)).as("decay_score"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
             |cutoff AS (SELECT max(d) AS cd FROM ev),
             |aged AS (
             |  SELECT user_id, date_diff('day', d, cd) AS age
             |  FROM ev CROSS JOIN cutoff
             |  WHERE date_diff('day', d, cd) BETWEEN 0 AND 29)
             |SELECT user_id, count(*) AS n_recent,
             |  CAST(sum(1::BIGINT << (29 - age)) AS BIGINT) / 536870912
             |    AS decay_score
             |FROM aged GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ------------------------------------------ event-type Markov matrix
    // First-order transition matrix of the per-user event stream:
    // lead() over the (ts, event_id)-total-ordered user window pairs
    // each event with its successor, then one aggregate counts each
    // (from, next) edge and a tiny window over the from-type totals
    // turns counts into row-normalized probabilities (ONE int/int
    // division, exact). Scale: ONE shuffle on user_id for the window,
    // one partial-aggregated shuffle on the (from, next) pair — the
    // pair table is |event_types|² rows, so everything after the first
    // aggregate is free regardless of corpus size.
    QueryDef(
      "q52_markov_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wTot = Window.partitionBy(col("from_type"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            round(col("n").cast("double") /
              sum(col("n")).over(wTot).cast("double"), 6))
          .orderBy("from_type", "next_type")
      },
      Some("""WITH nxt AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |cnt AS (
             |  SELECT from_type, next_type, count(*) AS n FROM nxt
             |  WHERE next_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, next_type, n,
             |  round(CAST(n AS DOUBLE) /
             |        CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
             |    AS p
             |FROM cnt ORDER BY from_type, next_type""".stripMargin)))
}
