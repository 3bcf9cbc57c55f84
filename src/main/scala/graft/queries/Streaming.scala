package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopKDoubles

/** Q20 streaming queries (batch-equivalent, DuckDB-oracle checked) and the
  * Q21 typed-Aggregator surface.
  */
object Streaming {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q20_stream_tumbling",
      (s, dir) => graft.streaming.StreamOps.tumbling(s, dir)
        .withColumn("w_start", col("w_start").cast("timestamp")),
      Some("""SELECT date_trunc('hour', ts) AS w_start, event_type,
             |       count(*) AS n_events
             |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    QueryDef(
      "q20_stream_sliding",
      (s, dir) => graft.streaming.StreamOps.sliding(s, dir),
      // each event contributes to the window starting at its hour and the
      // one starting an hour earlier (2h windows sliding by 1h)
      Some("""SELECT w_start, count(*) AS n_events FROM (
             |  SELECT date_trunc('hour', ts) AS w_start FROM events
             |  UNION ALL
             |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS w_start FROM events)
             |GROUP BY w_start ORDER BY w_start""".stripMargin)),

    QueryDef(
      "q20_stream_dedup",
      (s, dir) => graft.streaming.StreamOps.dedupState(s, dir),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Typed Aggregator top-k: top-3 order prices per customer, exploded to
    // rows so the oracle compare stays scalar-typed.
    QueryDef(
      "q21_topk_aggregator",
      (s, dir) => {
        import s.implicits._
        val topk = udaf(new TopKDoubles(3))
        Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(topk(col("o_totalprice")).as("top_prices"))
          .select(col("o_custkey"), posexplode(col("top_prices")).as(Seq("rk", "price")))
          .select(col("o_custkey"), (col("rk") + 1).cast("long").as("rk"), col("price"))
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, CAST(rk AS BIGINT) AS rk, price FROM (
             |  SELECT o_custkey, o_totalprice AS price,
             |         row_number() OVER (PARTITION BY o_custkey
             |             ORDER BY o_totalprice DESC) AS rk
             |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin))
  )
}
