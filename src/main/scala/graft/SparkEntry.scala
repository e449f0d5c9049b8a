package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query surface from the per-area modules:
  *   - [[graft.operators.RelationalQueries]] — filters/joins/aggs/windows/…
  *   - [[graft.functions.RenderQueries]]     — Kusto type-rendering semantics
  *   - [[graft.operators.LlmQueries]]        — dedup/similarity/text analysis
  *   - [[graft.operators.StreamingQueries]]  — event-time windowing (batch parity)
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.RelationalQueries,
    functions.RenderQueries,
    sources.MetadataQueries,
    operators.LlmQueries,
    operators.CorpusQueries,
    operators.ExtendedQueries,
    operators.TemporalQueries,
    operators.EventAnalytics,
    operators.SketchQueries,
    operators.GovernanceQueries,
    streaming.StreamingQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
