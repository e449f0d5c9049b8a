package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY r16 profiling scratch — deleted before round end. */
object Scratch161 {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"[scratch] --- round $round ---")
      val sets = time("tokenSets build")(
        operators.LlmQueries.tokenSets(spark, sfDir))
      time("sets count")(println("  sets rows: " + sets.count()))
      val pref = time("prefixIndex materialize") {
        val p = operators.LlmQueries.prefixIndex(sets, 8).localCheckpoint()
        println("  prefix rows: " + p.count()); p
      }
      time("raw self-join count") {
        val alpha = s"(8 * (a.sz + b.sz) + 17) DIV 18"
        val cand = pref.as("a").join(pref.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * 10 >= col("b.sz") * 8 &&
            col("b.sz") * 10 >= col("a.sz") * 8 &&
            least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1 >=
              expr(alpha))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        println("  raw matches: " + cand.count())
      }
      time("distinct cand count") {
        val alpha = s"(8 * (a.sz + b.sz) + 17) DIV 18"
        val cand = pref.as("a").join(pref.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * 10 >= col("b.sz") * 8 &&
            col("b.sz") * 10 >= col("a.sz") * 8 &&
            least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1 >=
              expr(alpha))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        println("  cand pairs: " + cand.count())
      }
      time("full q161 noop")(
        noop(operators.LlmQueries.prefixFilterPairs(sets, 8)
          .orderBy(col("doc_a"), col("doc_b"))))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
