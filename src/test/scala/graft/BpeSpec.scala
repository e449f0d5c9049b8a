package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q243 BPE trainer semantics on PLANTED dictionaries — the geometry the
  * corpus may never exercise but the algorithm's determinism contract
  * depends on: overlap handling of the merge replace (leftmost
  * non-overlapping, the greedy BPE convention, identical in Spark and
  * DuckDB replace()) and the (pair_freq DESC, lhs, rhs) tie-break.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bpe-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def train(words: (String, Long)*) = {
    val s = spark
    import s.implicits._
    graft.operators.CorpusQueries.bpeTrainOn(words.toDF("word", "freq"))
      .orderBy(col("round"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
  }

  test("the EMPTY word trains without crashing and contributes zero pairs") {
    // A whitespace-only document tokenizes to "" (split('', ws) is ['']
    // in both engines), so the empty word reaches every dictionary.
    // Its seq " " has 2 split parts -> pair-slice length -1, which
    // Spark's slice REJECTS while DuckDB's list slice degrades to [] —
    // the r15 hostile-corpus crash that took down all eight BPE
    // queries; the greatest(...,0) clamp restores the DuckDB-parity
    // zero-pairs degrade. The merges must be exactly those of the same
    // dictionary WITHOUT the empty word.
    val withEmpty = train("" -> 100L, "ab" -> 3L, "abab" -> 2L)
    val without = train("ab" -> 3L, "abab" -> 2L)
    assert(withEmpty.toSeq == without.toSeq,
      s"empty word must be pair-neutral: $withEmpty vs $without")
    assert(withEmpty.head._2 == "a" && withEmpty.head._3 == "b")
  }

  test("same-symbol run: boundary-consuming replace merges every OTHER occurrence per pass") {
    // The documented run convention (see bpeMerges): the ' a a '
    // pattern consumes both boundary spaces, so ' a a a a ' -> round 1
    // ' aa a a ' ((a,a) counted 3), round 2 merges the surviving (a,a)
    // (ties with (aa,a) at count 1, (a,a) wins lexicographically) ->
    // ' aa aa ', round 3 merges (aa,aa) -> ' aaaa '. Rounds 4+ have no
    // pairs left: the ''-guard keeps the dictionary intact and emits no
    // merge rows.
    val m = train(("aaaa", 1L))
    assert(m.length == 3, s"expected exactly 3 merges, got ${m.toSeq}")
    assert(m(0) == (1, "a", "a", "aa", 3L))
    assert(m(1) == (2, "a", "a", "aa", 1L))
    assert(m(2) == (3, "aa", "aa", "aaaa", 1L))
  }

  test("odd-length run: aaa -> aa a -> aaa") {
    // ' a a a ' under (a,a): leftmost match consumes positions 0-4 and
    // the shared space, scan resumes after -> ' aa a '; round 2 merges
    // (aa,a).
    val m = train(("aaa", 1L))
    assert(m(0) == (1, "a", "a", "aa", 2L))
    assert(m(1) == (2, "aa", "a", "aaa", 1L))
  }

  test("equal-frequency pairs break ties lexicographically on (lhs, rhs)") {
    // 'ba' and 'ab' each contribute one pair: (b,a) and (a,b), both
    // freq 1 -> (a,b) wins round 1 by lhs order.
    val m = train(("ba", 1L), ("ab", 1L))
    assert((m(0)._2, m(0)._3) == ("a", "b"), s"tie-break drifted: ${m(0)}")
  }

  test("frequency weighting: the dictionary freq multiplies pair counts") {
    // 'xy' freq 5 vs 'zz' freq 3: (x,y) count 5 beats (z,z) count 3.
    val m = train(("xy", 5L), ("zz", 3L))
    assert(m(0) == (1, "x", "y", "xy", 5L))
    assert(m(1) == (2, "z", "z", "zz", 3L))
  }

  test("q248 curve: fertility is non-increasing in the merge budget and word mass is constant") {
    // Prefix-closure (the q248 argument): encoding under the first r
    // merges can only shrink or keep each word's symbol count as r
    // grows — any increase means the truncated wide-frame apply drifted
    // from the training states s_r.
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q248_bpe_vocab_curve")(spark, dir)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8))
    assert(rows.map(_._2).distinct.length == 1,
      "the word denominator must not depend on the merge budget")
    assert(rows.sliding(2).forall(p => p(1)._3 <= p(0)._3),
      s"n_bpe must be non-increasing in merges: ${rows.toSeq}")
    assert(rows.sliding(2).forall(p => p(1)._4 <= p(0)._4),
      s"fertility must be non-increasing in merges: ${rows.toSeq}")
  }

  test("q283 unigram segmentation equals an independent in-memory replay of the whole chain") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q283_unigram_segmentation")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // --- independent replay (plain Scala, no Spark expressions):
    // corpus stays in the BMP, so String.length/substring agree with
    // the SQL character semantics
    val toks = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.expr(
        graft.operators.LlmQueries.toksSql).as("tk"))
      .collect().flatMap(_.getSeq[String](0))
      .filter(w => w.nonEmpty && w.length <= 18)
    val occ = toks.groupBy(identity).map { case (w, l) => w -> l.length.toLong }
    val cand = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for ((w, o) <- occ; i <- 0 until w.length; k <- 1 to 6
         if i + k <= w.length)
      cand(w.substring(i, i + k)) += o
    val t0 = cand.values.sum
    val vocab = cand.filter { case (p, f) => f * 10000 >= t0 || p.length == 1 }
    val t1 = vocab.values.sum
    val big = 1000000000000L
    def enc(p: String): Long = vocab.get(p)
      .map(f => java.lang.Long.toBinaryString(math.max(1L, t1 / f))
        .length.toLong * 64L + 1L)
      .getOrElse(big)
    val expect = occ.map { case (w, o) =>
      val best = Array.fill(w.length + 1)(Long.MaxValue / 2)
      best(0) = 0L
      for (i <- 1 to w.length; j <- math.max(0, i - 6) until i)
        best(i) = math.min(best(i), best(j) + enc(w.substring(j, i)))
      w -> (o, best(w.length) / 64, best(w.length) % 64)
    }
    assert(out.keySet == expect.keySet)
    for ((w, e) <- expect)
      assert(out(w) == e, s"word '$w': engine ${out(w)} vs replay $e")
    // and the optimum is never worse than all-single-chars
    for ((w, (_, cost, pieces)) <- expect) {
      val singles = w.map(c => enc(c.toString)).sum
      assert(cost * 64 + pieces <= singles,
        s"'$w' must not cost more than its single-char segmentation")
    }
  }
}
