package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
/** Developer tool: print the formatted physical plan of named queries
  * (`sbt "Test/runMain graft.PlanDump q229_pareto_frontier ..."`) —
  * the read-the-plan-first step before writing a PlanSpec pin. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"===== $q =====")
      println(p.split("\n").take(60).mkString("\n"))
    }
    spark.stop()
  }
}
