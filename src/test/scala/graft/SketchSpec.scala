package graft

import graft.functions.FrequentItems.{MGBuf, MisraGries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the Misra-Gries heavy-hitter sketch: the q92
  * two-pass design is sound only if the sketch's candidate set CONTAINS
  * every item above the N/k threshold — under arbitrary partitioning of
  * the stream and arbitrary merge order, because that is what Spark's
  * partial aggregation does with the buffers.
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sketch-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Simulate Spark: split the stream into partitions, reduce each into
    * its own buffer, then merge the buffers pairwise left-to-right. */
  private def sketch(agg: MisraGries, stream: Seq[String], parts: Int): Map[String, Long] = {
    val bufs = stream.grouped(math.max(1, stream.size / parts)).map { chunk =>
      chunk.foldLeft(agg.zero)(agg.reduce)
    }
    agg.finish(bufs.reduce(agg.merge))
  }

  /** Zipf-ish stream: a few hot tokens over a long uniform tail. */
  private def stream(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n) {
      val r = rnd.nextInt(100)
      if (r < 30) s"hot${rnd.nextInt(3)}"        // 3 tokens share 30%
      else if (r < 45) s"warm${rnd.nextInt(10)}" // 10 tokens share 15%
      else s"tail${rnd.nextInt(5000)}"           // long tail
    }

  test("MG candidates contain every item above N/k, any partitioning") {
    val rnd = new Random(42)
    for (trial <- 0 until 5; parts <- Seq(1, 4, 17)) {
      val s = stream(rnd, 20000)
      val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val k = 50
      val heavy = exact.filter { case (_, c) => c * k > s.size }.keySet
      val cand = sketch(new MisraGries(k), s, parts).keySet
      assert(heavy.subsetOf(cand),
        s"trial=$trial parts=$parts missed: ${(heavy -- cand).toSeq.sorted}")
    }
  }

  test("MG counters never overestimate, and underestimate by at most N/k") {
    val rnd = new Random(7)
    val s = stream(rnd, 30000)
    val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 100
    val est = sketch(new MisraGries(k), s, 8)
    est.foreach { case (tok, c) =>
      val truth = exact(tok)
      assert(c <= truth, s"$tok estimated $c > true $truth")
      assert(truth - c <= s.size / k,
        s"$tok underestimated by ${truth - c} > N/k=${s.size / k}")
    }
  }

  test("iterative k-means: q94 assignment + Centroid UDAF loop, inertia never increases") {
    // The full Lloyd loop the q94 building block composes into: assign
    // (broadcast centroids, argmin squared L2) -> re-estimate (Centroid
    // UDAF, map-side partial agg) -> repeat. Lloyd's algorithm guarantees the
    // objective (sum of squared distances to the assigned centroid) is
    // non-increasing; a violation means assignment and re-estimation
    // disagree about the metric. Shapes mirror the production queries:
    // the corpus is never exchanged, centroids always broadcast, and the
    // per-round frames are localCheckpoint'd like q59's label loop so
    // CacheManager can't alias structurally-equal rounds.
    val s = spark
    import s.implicits._
    val dot = "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val centroid = udaf(new graft.functions.VectorAggregators.Centroid(64))
    def assign(cents: DataFrame): DataFrame =
      e.crossJoin(broadcast(cents))
        .withColumn("d2",
          expr(dot.format("v", "v")) - lit(2.0) * expr(dot.format("v", "c")) +
            expr(dot.format("c", "c")))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)))
        .filter(col("rnk") === 1)
        .select(col("vec_id"), col("cid"), col("v"), col("d2"))
    var cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("c")).localCheckpoint()
    val inertias = (0 until 3).map { _ =>
      val a = assign(cents).localCheckpoint()
      val inertia = a.agg(sum(greatest(col("d2"), lit(0.0)))).head.getDouble(0)
      cents = a.groupBy(col("cid")).agg(centroid(col("v")).as("c")).localCheckpoint()
      inertia
    }
    assert(inertias.size == 3 && inertias.forall(_ > 0.0), inertias.toString)
    // tolerate float noise at the 1e-9 relative level, nothing more
    inertias.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev * (1.0 + 1e-9),
        s"inertia increased across a Lloyd round: $inertias")
    }
    assert(inertias.last < inertias.head, s"no progress at all: $inertias")
  }

  test("TopK aggregator: any partitioning/merge order equals the global sort's top-k") {
    import graft.functions.TopKAggregator.TopK
    val rnd = new Random(13)
    for (trial <- 0 until 5; parts <- Seq(1, 3, 16)) {
      // duplicate scores on purpose: the id tiebreak must decide
      val data = Seq.fill(500)((rnd.nextInt(40).toDouble, rnd.nextLong(100000)))
      val agg = new TopK(7)
      val bufs = data.grouped(math.max(1, data.size / parts))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = agg.finish(rnd.shuffle(bufs).reduce(agg.merge))
      val expected = data.sortWith((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(7)
      assert(merged == expected, s"trial=$trial parts=$parts")
      // buffers never exceed k entries
      bufs.foreach(b => assert(b.scores.length <= 7))
    }
  }

  test("MG buffer stays bounded at 2k entries regardless of cardinality") {
    val agg = new MisraGries(20)
    val rnd = new Random(11)
    val buf = (0 until 50000).map(_ => s"u${rnd.nextInt(40000)}")
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.m.size <= 40, s"buffer grew to ${buf.m.size}")
    val merged = agg.merge(buf, MGBuf(buf.m.map { case (k, v) => (k + "x", v) }))
    assert(agg.finish(merged).size <= 20)
  }

  test("q190 Poisson(1) threshold table matches the analytic inverse CDF") {
    // the fixed integer thresholds both engines share: cumulative
    // e^-1/k! on the 1e6 grid — re-derived here independently so a
    // typo'd constant fails a spec, not a statistics review
    val want = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L,
      999917L, 999990L)
    var cum = 0.0
    var fact = 1.0
    val got = (0 until 8).map { k =>
      if (k > 0) fact *= k
      cum += math.exp(-1.0) / fact
      math.round(cum * 1e6)
    }
    assert(got == want, got)
  }

  test("KMV aggregator: unsigned bottom-k, duplicate-collapsing, merge-order invariant") {
    import graft.functions.KmvAggregator.KMinLongs
    val rnd = new Random(17)
    for (trial <- 0 until 5; parts <- Seq(1, 3, 16)) {
      // negative longs are the LARGE half of the unsigned domain — the
      // sketch must prefer small non-negatives over any negative
      val data = Seq.fill(400)(rnd.nextLong()) ++ Seq(5L, 5L, 5L, -1L)
      val agg = new KMinLongs(8)
      val bufs = data.grouped(math.max(1, data.size / parts))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = agg.finish(rnd.shuffle(bufs).reduce(agg.merge))
      val expected = data.distinct
        .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).take(8)
      assert(merged == expected, s"trial=$trial parts=$parts")
      bufs.foreach(b => assert(b.vs.length <= 8))
      assert(merged.distinct.size == merged.size, "duplicates must collapse")
    }
    // small-group branch: fewer distinct values than k -> the sketch IS
    // the distinct set (q178's m < k exact fallback)
    val small = new KMinLongs(8)
    val got = small.finish(Seq(9L, 2L, 9L, 2L, 7L).foldLeft(small.zero)(small.reduce))
    assert(got == Seq(2L, 7L, 9L))
  }

  test("q191 KMV set algebra: union = merge+re-truncate, intersection membership exact") {
    // the two identities q191's pair stage rests on, certified against
    // the true sets: (a) the bottom-k of (sketch(A) ++ sketch(B)) IS
    // the bottom-k of A union B (sketch-of-union = union-of-sketches),
    // and (b) for every h in that union bottom-k, h <= the kth minimum
    // of EITHER input, so h in A  <=>  h in sketch(A) — membership
    // against the sketch alone has no false negatives inside the
    // union's bottom-k window (Bar-Yossef et al. 2002, Prop. for
    // bottom-k intersections)
    import graft.functions.KmvAggregator.KMinLongs
    val rnd = new Random(191)
    val unsLt = (a: Long, b: Long) => java.lang.Long.compareUnsigned(a, b) < 0
    for (trial <- 0 until 5) {
      val shared = Seq.fill(120)(rnd.nextLong())
      val a = (shared.take(60) ++ Seq.fill(300)(rnd.nextLong())).distinct
      val b = (shared.take(60) ++ Seq.fill(300)(rnd.nextLong())).distinct
      val agg = new KMinLongs(16)
      def sk(xs: Seq[Long]) = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val (sa, sb) = (sk(a), sk(b))
      val ku = (sa ++ sb).distinct.sortWith(unsLt).take(16)
      // (a) union identity
      assert(ku == (a ++ b).distinct.sortWith(unsLt).take(16), s"trial=$trial")
      // (b) membership exactness inside the window: sketch membership
      // agrees with TRUE set membership for every union-bottom-k hash
      ku.foreach { h =>
        assert(sa.contains(h) == a.contains(h), s"trial=$trial h=$h A")
        assert(sb.contains(h) == b.contains(h), s"trial=$trial h=$h B")
      }
      // rho/k over the window = the estimator's numerator; with 60
      // genuinely shared values the intersection is visible
      val rho = ku.count(h => sa.contains(h) && sb.contains(h))
      assert(rho == ku.count(h => a.contains(h) && b.contains(h)))
    }
  }

  test("q231 Fisher: planted scatters — signal dim exact, constant dim NULL, identical classes 0") {
    val ss = spark; import ss.implicits._
    import graft.operators.SketchQueries.classSeparation
    // dim 1 carries the labels (a at 0/2, b at 10/12): within = (0-1)^2
    // +(2-1)^2 per class = 2+2 = 4, between = 2*(1-6)^2 + 2*(11-6)^2 =
    // 100, fisher = 25.0 exactly. dim 2 is the constant 5: both
    // scatters 0 -> fisher NULL (0/0, not 0).
    val sig = classSeparation(Seq(
        ("a", Seq(0L, 5L)), ("a", Seq(2L, 5L)),
        ("b", Seq(10L, 5L)), ("b", Seq(12L, 5L))).toDF("label", "f"))
      .orderBy(col("dim")).collect()
    assert(sig.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 4L, 100L), (2L, 0L, 0L)))
    assert(sig(0).getDouble(3) == 25.0)
    assert(sig(1).isNullAt(3), "0/0 separability is undefined, not zero")
    // identically-distributed classes: class means = grand mean ->
    // between exactly 0, fisher exactly 0.0 (within 50 per class)
    val same = classSeparation(Seq(
        ("a", Seq(0L)), ("a", Seq(10L)),
        ("b", Seq(0L)), ("b", Seq(10L))).toDF("label", "f"))
      .collect().head
    assert((same.getLong(1), same.getLong(2), same.getDouble(3)) ==
      (100L, 0L, 0.0))
  }

  test("q234 SQ8: planted range — exact codes/errors, constant dim zero, bound holds") {
    val ss = spark; import ss.implicits._
    import graft.operators.SketchQueries.sq8Audit
    // dim 1 spans [0, 510] (range exactly 2 grid units per code step):
    // endpoints reconstruct exactly; the midpoint 255 codes to 128 and
    // dequantizes to 256 -> err 1 (= the analytic bound's rounding
    // term). dim 2 is constant -> range 0, all codes 0, zero error.
    val got = sq8Audit(Seq(
        Seq(0L, 7L), Seq(510L, 7L), Seq(255L, 7L)).toDF("f"))
      .orderBy(col("dim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq((1L, 3L, 0L, 510L, 1L, 0.333), (2L, 3L, 7L, 7L, 0L, 0.0)))
    // analytic bound on the real table: max_err <= range DIV 510 + 1
    // (two half-up roundings, each at most half a step)
    val real = sq8Audit(Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0D) AS BIGINT))")
        .as("f"))).collect()
    assert(real.length == 64)
    real.foreach { r =>
      val bound = (r.getLong(3) - r.getLong(2)) / 510 + 1
      assert(r.getLong(4) <= bound, s"dim ${r.getLong(0)}: ${r.getLong(4)} > $bound")
    }
  }
}
