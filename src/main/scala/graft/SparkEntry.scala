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
    operators.IngestQueries,
    streaming.StreamingQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every `FROM embeddings` is uniformly rewritten to read through the
    * vector-validation predicate ([[operators.LlmQueries.VecValidDuckSql]])
    * — the oracle mirror of the engine's
    * [[operators.LlmQueries.vecTable]] ingestion tier, applied in ONE
    * place so no individual oracle can fork the admitted population
    * (r15 hostile-corpus sweep). On clean corpora the predicate keeps
    * every row, so no clean-data hash moves. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap.map { case (k, sql) =>
      k -> sql
        .replace("FROM embeddings",
          "FROM (SELECT * FROM embeddings WHERE " +
            operators.LlmQueries.VecValidDuckSql + ") embeddings")
        // anonymous subquery (no re-alias) so `FROM events e ...` sites
        // keep their own alias; the predicate text parses in both
        // engines, see Tables.EventsValidSql
        .replace("FROM events",
          "FROM (SELECT * FROM events WHERE " + Tables.EventsValidSql + ")")
        .replace("FROM documents",
          "FROM (SELECT * FROM documents WHERE " + Tables.DocsValidSql + ")")
    }

  /** Container-typed (array/struct/map) columns of a gate output schema
    * — the r12 q257 postmortem's contract: the correctness driver sorts
    * RAW cells and cannot sort containers, so gated queries must emit
    * scalars only (to_json or explode). ONE definition shared by the
    * Verify dump guard and the WindowAuditSpec schema audit. */
  def containerCols(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
        || f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
        || f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq
}
