package graft.sources

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracled queries over the metadata operators (reference entry point 3,
  * `/root/reference/pq2json/src/schema.rs`). Footer-only reads; the
  * "query" is a tiny driver-built DataFrame so the harness can hash it.
  */
object MetadataQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- `--cslschema` (schema.rs:43-109) over two physically distinct
    // tables. Both carry NAIVE-micros timestamps (isAdjustedToUTC=false,
    // no legacy ConvertedType in the footer) — `ts` and `l_shipdate`
    // therefore map to `long`, the reference's legacy-visibility rule
    // (only adjusted-UTC MILLIS/MICROS are `datetime`; closed
    // bug-for-bug in round 12, see ParquetMetadata.fieldCslType).
    "q23_cslschema" -> ((s, dir) => {
      import s.implicits._
      val rows = Seq("lineitem", "events").flatMap { t =>
        ParquetMetadata.cslSchema(s"$dir/$t.parquet").map(c => (t, c.name, c.cslType))
      }
      rows.toDF("tbl", "name", "csl_type")
    }),

    // --- `--rowgroups` (schema.rs:118-143): numberOfRows/totalByteSize as
    // strings, exactly like the reference's stringly-typed JSON output.
    "q24_rowgroups" -> ((s, dir) => {
      import s.implicits._
      ParquetMetadata.rowGroups(s"$dir/lineitem.parquet")
        .map(r => (r.numberOfRows, r.totalByteSize))
        .toDF("num_rows", "total_byte_size")
    })
  )

  def oracles: Map[String, String] = Map(
    // Constant golden: the CSL mapping is a pure function of the schema,
    // which is scale-factor-independent (TESTDATA.md fixes it).
    "q23_cslschema" ->
      """SELECT * FROM (VALUES
        |  ('lineitem', 'l_orderkey', 'long'),
        |  ('lineitem', 'l_partkey', 'long'),
        |  ('lineitem', 'l_suppkey', 'long'),
        |  ('lineitem', 'l_linenumber', 'int'),
        |  ('lineitem', 'l_quantity', 'real'),
        |  ('lineitem', 'l_extendedprice', 'real'),
        |  ('lineitem', 'l_discount', 'real'),
        |  ('lineitem', 'l_tax', 'real'),
        |  ('lineitem', 'l_returnflag', 'string'),
        |  ('lineitem', 'l_linestatus', 'string'),
        |  ('lineitem', 'l_shipdate', 'long'),
        |  ('events', 'event_id', 'long'),
        |  ('events', 'ts', 'long'),
        |  ('events', 'user_id', 'long'),
        |  ('events', 'event_type', 'string'),
        |  ('events', 'value', 'real'),
        |  ('events', 'props', 'string')
        |) AS t(tbl, name, csl_type)""".stripMargin,
    // {SF_DIR} is substituted with the actual scale-factor directory when
    // Verify dumps oracle_sql.json (Verify.main receives it), so the oracle
    // introspects the SAME footer DuckDB-side whatever sf the run uses.
    "q24_rowgroups" ->
      """SELECT CAST(row_group_num_rows AS VARCHAR) AS num_rows,
        |  CAST(SUM(total_uncompressed_size) AS VARCHAR) AS total_byte_size
        |FROM parquet_metadata('{SF_DIR}/lineitem.parquet')
        |GROUP BY row_group_id, row_group_num_rows""".stripMargin
  )
}
