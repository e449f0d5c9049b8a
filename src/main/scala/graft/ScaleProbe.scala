package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Off-gate scale probe: amplifies the sf0.1 corpus Nx and times
  * representative dedup/ANN queries at the amplified scale — the
  * "would this hold at 10x" question neither the sf0.01 driver gate nor
  * the sf0.1 bench can answer (round 8's sf0.1 sweep caught a rounding
  * divergence one level above the gate; this is the same idea for
  * RUNTIME scaling laws).
  *
  * Amplification is structure-preserving by construction:
  *  - documents: replica r of each doc suffixes every token with `_r`,
  *    so tokens/shingles are DISJOINT across replicas and the near-dup
  *    pair structure is exactly N independent copies of sf0.1 — the
  *    expected cost curve of every blocked dedup query is LINEAR, and
  *    a measured super-linear curve is a real finding, not an artifact
  *    of planting N-way duplicate bombs.
  *  - embeddings: replicas reuse the label (cell) structure, so
  *    cell-blocked ANN probes (fixed query count) scale their candidate
  *    volume linearly, while the all-corpus kNN graph (q146) scales its
  *    pair volume ~N² under a FIXED cell count — the measured curve
  *    quantifies exactly when the cell-count parameter must grow ~√n.
  *
  * Usage: runMain graft.ScaleProbe [reps] [q1,q2,...]
  * Writes amplified parquet under target/scaleprobe/x<reps>/ (reused if
  * present); prints one `[scaleprobe]` line per query. A builder tool —
  * not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val queries = if (args.length > 1) args(1).split(",").toSeq
                  else Seq("q34_ngram_jaccard", "q46_ann_ivf")
    val src = "/root/testdata/sf0.1"
    // v2: round-11 stride fix (o_custkey/user_id aligned to c_custkey's
    // r*1e8) — versioned dir so stale pre-fix amplified data with
    // orphaned customer joins is never silently reused.
    val out = s"/root/repo/target/scaleprobe/v2/x$reps"
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
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      val rep = spark.range(0, reps).select(col("id").as("r"))
      // replica id spacing (100k docs / 1M vecs) clears the planted-copy
      // id offsets (+10000 / +20000 / +100000) so replicas never collide
      spark.read.parquet(s"$src/documents.parquet").crossJoin(rep)
        .withColumn("text", when(col("r") === 0, col("text")).otherwise(expr(
          "array_join(transform(split(trim(text), '\\\\s+')," +
            " t -> concat(t, '_', r)), ' ')")))
        .withColumn("doc_id", col("doc_id") + col("r") * 100000L)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      spark.read.parquet(s"$src/embeddings.parquet").crossJoin(rep)
        .withColumn("vec_id", col("vec_id") + col("r") * 1000000L)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    // events: replica r shifts user_id/event_id, keeps ts — N
    // independent user populations on the same clock, so per-user
    // window/lag state and per-window aggregation both scale linearly
    // by construction (this sf0.1 vintage is micros; written back
    // as-is, Tables' type dispatch handles either vintage). Own guard:
    // pre-existing amplified dirs from earlier sessions lack events.
    if (!new java.io.File(s"$out/events.parquet").exists()) {
      val rep = spark.range(0, reps).select(col("id").as("r"))
      // user_id stride matches customer's c_custkey stride (r*1e8, see
      // below) so the stream-static enrichment join (StreamingQueries
      // events.user_id = customer.c_custkey) stays structure-preserving
      // at amplified scale (ADVICE r10).
      spark.read.parquet(s"$src/events.parquet").crossJoin(rep)
        .withColumn("user_id", col("user_id") + col("r") * 100000000L)
        .withColumn("event_id", col("event_id") + col("r") * 100000000L)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    // lineitem/orders: replica r shifts the shared orderkey, so each
    // replica is a self-contained TPC-H slice — referential integrity,
    // per-order line groups, and key-distinct counts all scale linearly
    // by construction (q179/q180's join/profile shapes). Other columns
    // unchanged: value-domain distincts (flags, dates) stay constant,
    // as they would under real growth.
    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      val rep = spark.range(0, reps).select(col("id").as("r"))
      spark.read.parquet(s"$src/lineitem.parquet").crossJoin(rep)
        .withColumn("l_orderkey", col("l_orderkey") + col("r") * 100000000L)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      // o_custkey shifts by the SAME r*1e8 stride as customer's
      // c_custkey below (ADVICE r10): without it, replica r>0 customers
      // were orphaned from orders and any customer-orders join probed at
      // amplified scale ran on non-structure-preserving data,
      // contradicting the referential-integrity claim above.
      spark.read.parquet(s"$src/orders.parquet").crossJoin(rep)
        .withColumn("o_orderkey", col("o_orderkey") + col("r") * 100000000L)
        .withColumn("o_custkey", col("o_custkey") + col("r") * 100000000L)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
    }
    // customer: replica r shifts the key, keeps QI columns (segment,
    // nation, balance) — equivalence classes GROW x N while the class
    // count stays constant, which is what real population growth does
    // to a k-anonymity audit (q204).
    if (!new java.io.File(s"$out/customer.parquet").exists()) {
      val rep = spark.range(0, reps).select(col("id").as("r"))
      spark.read.parquet(s"$src/customer.parquet").crossJoin(rep)
        .withColumn("c_custkey", col("c_custkey") + col("r") * 100000000L)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
    }
    queries.foreach { q =>
      spark.catalog.clearCache(); System.gc()
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, out)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val first = run()
      val second = run()
      println(f"[scaleprobe] reps=$reps $q first=$first%.2f min=${math.min(first, second)}%.2f")
    }
    spark.stop()
  }
}
