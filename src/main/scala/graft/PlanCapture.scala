package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture tool for the optimization rounds: writes
  * `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<tag>.txt` — the judge-checkable evidence files
  * under plans/rNN/. Same session shape as Bench (local[cpus], AQE on,
  * shuffle.partitions = cpus) so the captured plan is the one the bench
  * actually runs — except spark.ui/noise settings irrelevant to plan
  * shape. Usage:
  *   runMain graft.PlanCapture <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanCapture {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val prefixes = names.split(",")
    val selected = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    selected.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plancapture] wrote $name ($tag)")
    }
    spark.stop()
  }
}
