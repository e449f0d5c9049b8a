package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query-name prefixes to run (local
    // iteration on one query without the full 113-query sweep).
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).headOption)
    def selected(name: String): Boolean =
      only.forall(_.split(",").exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogScopes.quietWindowExec() // see the helper's doc (r13 item 2)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      // NonFatal only (the Bench.timedRun rule): a broken query prints
      // and the dump continues, but a fatal VM error (OOM) means the
      // JVM may be corrupted — dumping the remaining queries on it
      // could write garbage parquet presented as results.
      // Stale-dump guard (ADVICE r13): a REFUSED or failed query must
      // not leave a previous run's parquet at $outDir/$name — a reused
      // out dir would silently present stale results to the comparator
      // instead of surfacing the refusal. Delete first; only a
      // successful dump recreates it.
      def dropStale(): Unit = {
        val d = new java.io.File(s"$outDir/$name")
        if (d.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(d)
          // a stale dump that SURVIVES deletion would be silently
          // compared as this run's result — exactly what the guard
          // exists to prevent, so say it loudly (r14 review)
          if (d.exists())
            System.err.println(s"[verify] $name WARNING: stale result " +
              s"dir $d could not be deleted — the comparator may read a " +
              "PREVIOUS run's output for this query")
        }
      }
      try {
        val df = fn(spark, sfDir)
        // Container-output guard (r12 q257 postmortem): the driver's
        // comparator sorts RAW cells and cannot sort array/struct/map —
        // a container column would error its row with an opaque pandas
        // TypeError. Refuse to dump it and say WHY instead, so the
        // failure names the contract at the source. Mirrored by the
        // WindowAuditSpec schema audit and compare_oracle.py.
        val nested = SparkEntry.containerCols(df.schema)
        if (nested.nonEmpty) {
          dropStale()
          System.err.println(s"[verify] $name REFUSED: container-typed " +
            s"output column(s) ${nested.mkString(", ")} — gated queries " +
            "must emit scalars (to_json or explode; see the q257 lesson)")
        } else df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case scala.util.control.NonFatal(e) =>
        dropStale()
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {SF_DIR}: oracles that introspect a parquet file by path (q24) get
    // the run's actual scale-factor dir, not a hardcoded one.
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{SF_DIR}", sfDir))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
