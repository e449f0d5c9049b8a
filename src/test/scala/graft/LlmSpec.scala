package graft

import graft.functions.{Fnv64, TextFunctions}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** LLM-pipeline operator semantics: dedup recall on planted duplicates,
  * SimHash/RollingHash expression behavior, ANN sanity vs brute force.
  * Runs on the sf0.001 harness tables for speed.
  */
class LlmSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("llm-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("simhash: identical token sets collide, disjoint sets differ") {
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(Seq("a", "b", "c", "d")), Row(Seq("d", "c", "b", "a")),
        Row(Seq("w", "x", "y", "z"))),
      StructType(Seq(StructField("t", ArrayType(StringType)))))
    val hs = df.select(TextFunctions.simhash64(col("t"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(1)) // order-insensitive (set semantics)
    assert(hs(0) != hs(2))
  }

  test("rolling hash: deterministic polynomial over bytes") {
    val df = spark.createDataFrame(
      java.util.List.of(Row("ab"), Row("ba"), Row("")),
      StructType(Seq(StructField("s", StringType))))
    val hs = df.select(TextFunctions.rollingHash64(col("s"))).collect().map(_.getLong(0))
    assert(hs(0) == 'a'.toLong * 31 + 'b'.toLong)
    assert(hs(0) != hs(1))
    assert(hs(2) == 0L)
  }

  test("fnv64 matches spec vector") {
    // FNV-1a 64 of empty input is the offset basis.
    assert(Fnv64.hash("") == 0xcbf29ce484222325L)
  }

  test("exact dedup finds every planted copy") {
    val rows = q("q33_dedup_exact").collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getLong(2) == 2L)) // each fingerprint has 2 copies
  }

  test("minhash LSH recall on planted near-duplicates") {
    val pairs = q("q35_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = pairs.count { case (a, b) => b == a + 10000 }
    // Docs whose true Jaccard >= 0.5 (the verification threshold): recall
    // over those is what LSH banding controls; expect near-total.
    assert(planted > 400, s"planted recall $planted/500 too low")
    // precision: non-planted pairs must still be true near-dups (jaccard
    // verified in-query), so every output row passed the exact check.
    assert(pairs.nonEmpty)
  }

  test("simhash banding finds planted near-duplicates with low hamming") {
    val pairs = q("q36_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = pairs.count { case (a, b) => b == a + 10000 }
    assert(planted > 250, s"planted simhash recall $planted/500 too low")
  }

  test("ngram jaccard pairs are symmetric-free and thresholded") {
    val rows = q("q34_ngram_jaccard").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.5))
    val planted = rows.count(r => r.getLong(1) == r.getLong(0) + 10000)
    assert(planted > 400)
  }

  test("embedding near-dup: every planted scaled copy found at cosine 1.0") {
    val rows = q("q38_dedup_embedding").collect()
    val planted = rows.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(planted.length == 500)
    assert(planted.forall(_.getDouble(2) == 1.0))
  }

  test("ANN-LSH results are a subset of brute-force candidates with exact scores") {
    val brute = q("q37_knn_cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ann = q("q39_ann_lsh").collect()
    assert(ann.nonEmpty)
    // every ANN hit's score equals the exact cosine (same computation)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(s => assert(s == r.getDouble(2)))
    }
  }

  test("IVF ANN: centroid aggregator cells partition the corpus; scores exact") {
    val brute = q("q37_knn_cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = q("q46_ann_ivf").collect()
    assert(ivf.nonEmpty)
    // IVF probes one cell, so its hits are a subset of the corpus with the
    // same exact cosine computation as brute force.
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(s => assert(s == r.getDouble(2)))
    }
    // every query that appears emits at most k=3 ranked neighbors
    val byQuery = ivf.groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.length <= 3))
  }

  test("multimodal stub: per-partition decode preserves ids and byte counts") {
    val out = q("q40_multimodal").collect()
    assert(out.length == 500)
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(byId == lens) // ASCII text: chars == bytes
  }
}
