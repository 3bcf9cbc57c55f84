package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.AsOfJoin

/** Feature-store / temporal-correctness operators — the q49 family.
  *
  * Training-set construction over an event log has one hard rule: a
  * feature attached to a label stamped at time T may only be computed
  * from data STRICTLY BEFORE T (point-in-time correctness; violating it
  * is label leakage and silently inflates offline metrics). The two
  * shapes here are the batch halves of a feature store:
  *
  *  - `q49_feature_join`: per-label feature retrieval — each purchase
  *    event gets the user's running activity state (event count, exact
  *    value sum) as of strictly before the purchase. Implementation is
  *    the strict-mode [[AsOfJoin]] (union-sort, ONE shuffle on user_id),
  *    not the correlated-subquery phrasing, which decorrelates to a
  *    nested loop (the q07_asof_sql lesson). The oracle IS that naive
  *    correlated form, so the rewrite is verified against it.
  *  - `q49_snapshot_asof`: time-travel snapshot — the per-user latest
  *    state at a cutoff, as ONE partial-aggregable `max(struct(...))`
  *    shuffle (no window, no per-partition sort of the full log), then
  *    a per-state rollup. This is "reconstruct the dimension table as
  *    of T" from an append-only log at 100 TB: the max-struct argmax is
  *    map-side combinable, so the shuffle carries one row per
  *    (user, partition), not the log.
  */
object Features {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[QueryDef] = Seq(

    // ------------------------------- point-in-time-correct feature join
    // Labels: purchase events. Features: the user's prior-activity state
    // (n earlier events, decimal-exact sum of their values) strictly
    // before the label's timestamp. Feature versions are first collapsed
    // to one row per (user_id, ts) — the state AFTER all events at that
    // instant — so the as-of probe is deterministic even with intra-
    // instant batches; the running totals are a per-user cumulative
    // window over those unique instants. Scale: one shuffle on user_id
    // for the cumulative window + one for the as-of union window —
    // both hash exchanges on the same key, no join explosion, versus
    // the oracle's correlated subquery which decorrelates to an
    // events×events nested loop.
    QueryDef(
      "q49_feature_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val atTs = ev.groupBy(col("user_id"), col("ts"))
          .agg(
            count(lit(1)).as("n_at_ts"),
            sum(col("value").cast(DecimalType(27, 6))).as("v_at_ts"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val versions = atTs.select(col("user_id"), col("ts"),
          sum(col("n_at_ts")).over(w).as("cum_n"),
          sum(col("v_at_ts")).over(w).as("cum_v"))
        val labels = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("uid"),
            col("ts").as("label_ts"), col("value").as("label_value"))
        AsOfJoin(labels, versions,
          leftKey = "uid", rightKey = "user_id",
          leftTime = "label_ts", rightTime = "ts",
          rightVals = Seq("cum_n" -> "feat_n", "cum_v" -> "feat_v"),
          inclusive = false)
          .select(col("event_id"), col("uid").as("user_id"),
            col("label_value"),
            coalesce(col("feat_n"), lit(0L)).as("feat_n_events"),
            coalesce(col("feat_v").cast("double"), lit(0.0))
              .as("feat_value_sum"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value AS label_value,
             |  (SELECT count(*) FROM events e2
             |   WHERE e2.user_id = e.user_id AND e2.ts < e.ts) AS feat_n_events,
             |  coalesce((SELECT CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
             |            FROM events e2
             |            WHERE e2.user_id = e.user_id AND e2.ts < e.ts), 0.0)
             |    AS feat_value_sum
             |FROM events e WHERE event_type = 'purchase'
             |ORDER BY event_id""".stripMargin)),

    // --------------------------------------- time-travel state snapshot
    // "What did the per-user state table look like at T?" from the
    // append-only log: per user, the latest event at-or-before the
    // cutoff — ONE max(struct(ts, event_id, ...)) aggregate (total order
    // guaranteed by the unique event_id tiebreak) — then a per-state
    // rollup of user counts and the decimal-exact sum of last values.
    // The filter prunes at the scan; the argmax is partial-aggregated
    // map-side, so no executor ever holds a user's full history.
    QueryDef(
      "q49_snapshot_asof",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
            col("value"))).as("st"))
          .select(col("st.event_type").as("state"),
            col("st.value").cast(DecimalType(27, 6)).as("v"))
          .groupBy(col("state"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("v")).cast("double").as("last_value_sum"))
          .orderBy("state"),
      Some("""WITH last AS (
             |  SELECT user_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
             |SELECT event_type AS state, count(*) AS n_users,
             |  CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS last_value_sum
             |FROM last WHERE rn = 1
             |GROUP BY event_type ORDER BY state""".stripMargin))
  )
}
