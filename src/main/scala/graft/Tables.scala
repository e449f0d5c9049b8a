package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness tables (TESTDATA.md): one parquet file per
  * table under the scale-factor directory. The reference engine's "table"
  * is a single local parquet file (`/root/reference/pq2json/src/converter.rs:35`);
  * here a table is whatever `spark.read.parquet` accepts — one file, a
  * directory of files, a partitioned tree — so the same call scales from
  * the sf0.001 harness file to a 100 TB multi-file dataset unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") loadEvents(spark, path)
    else spark.read.parquet(path)
  }

  /** The VALIDATED events surface every analytics query reads — the
    * ingestion-validation tier for the metric column (the r15
    * hostile-corpus finding, the events sibling of
    * `LlmQueries.vecTable`): a NaN/Inf value would fail every
    * DECIMAL(38,6) exact-sum cast under ANSI, and a |value| beyond 1e12
    * overflows the micro-grid BIGINT casts the trend/quantile queries
    * run on (engine CAST_OVERFLOW throws where DuckDB's behavior
    * differs per site). NULL value stays admitted — a missing metric is
    * legitimate and every aggregate already skips it. The oracle side
    * applies the identical predicate via SparkEntry's uniform `FROM
    * events` rewrite, so the two engines share one population; on
    * clean corpora the filter keeps every row. Pushed-down map-side
    * filter — no exchange. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").filter(expr(EventsValidSql))

  /** The validity predicate — identical text parses in Spark SQL and
    * DuckDB, so ONE string serves both engines. `ts IS NOT NULL` is
    * part of the contract: an event-TIME engine cannot place a
    * timeless event in any window, session, watermark, or as-of
    * order — the second hostile round showed the two engines
    * defaulting differently at ~20 sites (Spark's window generation
    * drops the row, SQL GROUP BY keeps a NULL bucket). */
  val EventsValidSql: String =
    "ts IS NOT NULL AND" +
      " (value IS NULL OR (NOT isnan(value) AND abs(value) <= 1000000000000.0))"

  /** The VALIDATED documents surface (the corpus sibling of the events
    * and vector tiers): a text corpus row without text cannot be
    * tokenized, hashed, deduplicated, or rendered — NULL text made the
    * engines diverge at every md5/split call site (and NPE'd the
    * byte-level decode). source is REQUIRED too — provenance is the
    * attribute every curation/governance operator keys on (mixing,
    * caps, per-source quality, licensing), and an unattributed doc
    * has no place in any of them (the two engines also default
    * differently when a NULL source meets a per-source join vs a
    * GROUP BY). lang stays nullable: unknown language is a legitimate
    * state the lang-id operators exist to resolve. Same
    * uniform-oracle-rewrite contract as the other tiers. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "documents").filter(expr(DocsValidSql))

  val DocsValidSql: String = "text IS NOT NULL AND source IS NOT NULL"

  /** events.ts has shipped as two different physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects outright unless spark.sql.legacy.parquet.nanosAsLong
    * makes it read as a raw nanos long — and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ. Dispatch on the ACTUAL read schema so either vintage
    * normalizes to the same micros TimestampType column:
    *  - LongType (nanos under the legacy flag): integral `DIV 1000`
    *    truncates to the micros domain, matching DuckDB's read-time
    *    truncation, so oracle comparisons see identical instants.
    *  - TIMESTAMP_NTZ: the naive datetimes are UTC wall clocks; casting
    *    under the UTC session (all entry points set it) yields the same
    *    instants DuckDB reads from the file.
    * The loader never mutates session config — if the file IS nanos and
    * the flag isn't set, the read throws Spark's PARQUET_TYPE_ILLEGAL,
    * re-raised here with the fix spelled out.
    */
  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try spark.read.parquet(path)
      catch { case scala.util.control.NonFatal(e)
          if String.valueOf(e.getMessage).contains("NANOS") =>
        throw new IllegalStateException(
          s"$path has TIMESTAMP(NANOS) — set spark.sql.legacy.parquet.nanosAsLong=true at session build", e)
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // the NTZ wall clocks are UTC instants; the cast below reads
        // them THROUGH the session time zone, so a non-UTC session
        // would silently shift every event instead of failing loudly
        // (the same loud-failure contract the nanos branch gets from
        // Spark's own PARQUET_TYPE_ILLEGAL)
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          s"$path has TIMESTAMP_NTZ event times: set spark.sql.session.timeZone=UTC " +
            "at session build or the cast to instants shifts every event")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => sys.error(s"$path: unsupported ts type $other (expected nanos-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
}

/** A named query (Spark side) plus, when SQL-expressible, the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * Column names/aliases MUST match between the two — the harness sorts
  * columns by name before hashing values.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
