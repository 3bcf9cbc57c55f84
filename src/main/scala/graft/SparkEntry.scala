package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Classifier, Conversion, Corpus, Curation, Engagement, Extended, Features, Insights, Lexical, LlmOps, Overlap, QueryDef, Relational, Release, Sampling, ScaleOps, Semantic, Streaming, TimeSeries, TpchSqlMore}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared inventory lives in graft.queries.* as QueryDefs (Spark impl +
  * DuckDB oracle SQL side by side); this object just assembles the maps the
  * driver consumes.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    Relational.all ++ Conversion.all ++ LlmOps.all ++ Streaming.all ++
      Extended.all ++ Analytics.all ++ TpchSqlMore.all ++ ScaleOps.all ++
      Corpus.all ++ Insights.all ++ TimeSeries.all ++ Semantic.all ++ Classifier.all ++ Release.all ++
      Curation.all ++ Sampling.all ++ Features.all ++ Lexical.all ++
      Engagement.all ++ Overlap.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_agg_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset Bench runs on sf0.1. */
  def benchQueries: Seq[QueryDef] = registry.filter(_.bench)
}
