package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for r17 q161 candidate-volume measurements (deleted
  * before round close). */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t10 = 8
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[qprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    timed("warm tokenSets+index (run 1 all phases)") {
      sink(graft.operators.LlmQueries.prefixFilterPairs(
        graft.operators.LlmQueries.tokenSets(spark, sfDir), t10))
    }
    spark.catalog.clearCache(); System.gc()
    val sets = timed("tokenSets") {
      graft.operators.LlmQueries.tokenSets(spark, sfDir)
    }
    val pref = timed("prefixIndex+checkpoint") {
      graft.operators.LlmQueries.prefixIndex(sets, t10).localCheckpoint()
    }
    val alpha = s"($t10 * (a.sz + b.sz) + ${10 + t10} - 1) DIV ${10 + t10}"
    val cand = pref.as("a").join(pref.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * 10 >= col("b.sz") * t10 &&
        col("b.sz") * 10 >= col("a.sz") * t10 &&
        least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1 >=
          expr(alpha))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    timed("candidate join alone (noop)") { sink(cand) }
    val x = sets.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
      col("hk").as("hk_a"))
    val y = sets.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
      col("hk").as("hk_b"))
    val verified = cand.join(x, Seq("doc_a")).join(y, Seq("doc_b"))
      .withColumn("n_shared", expr("sorted_intersect_atleast(hk_a, hk_b, " +
        s"($t10 * (sz_a + sz_b) + ${10 + t10} - 1) DIV ${10 + t10})"))
      .filter(col("n_shared") * 10 >=
        (col("sz_a") + col("sz_b") - col("n_shared")) * t10)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared") / (col("sz_a") + col("sz_b") - col("n_shared")))
          .as("jac"))
    timed("join+verify (no distinct)") { sink(verified) }
    timed("full with distinct+orderBy") {
      sink(verified.distinct().orderBy(col("doc_a"), col("doc_b")))
    }
    spark.stop()
  }
}
