package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: Spark implementation + (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Contract (see SparkEntry): output column NAMES and VALUES must match the
  * oracle exactly — the driver sorts columns by name and hash-compares
  * values. Determinism rules used throughout:
  *   - every query ends in an explicit ORDER BY on a unique key prefix;
  *   - double aggregation goes through DECIMAL (`sum(cast(x as decimal))`)
  *     so the result is independent of accumulation order — the test data's
  *     monetary fields are exact 2-decimal values, so the decimal cast is
  *     lossless in both engines;
  *   - integer-valued derived columns are cast to BIGINT on both sides
  *     (Spark `count` is already long; DuckDB `year()`/`len()` are bigint).
  *
  * `bench = true` marks the headline set that Bench runs on sf0.1.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
