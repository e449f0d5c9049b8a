package graft

import graft.functions.FrequentItems.{MGBuf, MisraGries}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the Misra-Gries heavy-hitter sketch: the q92
  * two-pass design is sound only if the sketch's candidate set CONTAINS
  * every item above the N/k threshold — under arbitrary partitioning of
  * the stream and arbitrary merge order, because that is what Spark's
  * partial aggregation does with the buffers.
  */
class SketchSpec extends AnyFunSuite {

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

  test("MG buffer stays bounded at 2k entries regardless of cardinality") {
    val agg = new MisraGries(20)
    val rnd = new Random(11)
    val buf = (0 until 50000).map(_ => s"u${rnd.nextInt(40000)}")
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.m.size <= 40, s"buffer grew to ${buf.m.size}")
    val merged = agg.merge(buf, MGBuf(buf.m.map { case (k, v) => (k + "x", v) }))
    assert(agg.finish(merged).size <= 20)
  }
}
