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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright ([PARQUET_TYPE_ILLEGAL]). With
      // spark.sql.legacy.parquet.nanosAsLong the raw nanos read as long,
      // then truncate to the micros TimestampType domain — the same
      // truncation DuckDB applies on read, so oracle comparisons see
      // identical instants. `DIV` keeps the arithmetic integral. The flag
      // is set ONCE at session build (Bench/Verify/specs) — loaders must
      // not mutate session config as a side effect, so fail loudly here
      // instead of setting it.
      require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "events table needs spark.sql.legacy.parquet.nanosAsLong=true set at session build")
      spark.read.parquet(path).withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(path)
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
