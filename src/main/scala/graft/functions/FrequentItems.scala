package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitter sketch as a typed `Aggregator`
  * (SURVEY §2.2 "UDF/UDAF" row, sketch family alongside HLL/quantile).
  *
  * The buffer keeps at most `2k` counters; when it overflows, the
  * (k+1)-th largest count `t` is subtracted from every counter and
  * non-positive entries are dropped (the batched Misra-Gries step).
  * Each trim removes at least `(k+1)·t` of total counted mass, and the
  * removed mass never exceeds the stream length `N`, so the sum of all
  * subtractions is at most `N/(k+1)` — every token with true frequency
  * greater than `N/k` therefore survives with a positive counter. The
  * same trim makes two buffers mergeable by counter addition (Agarwal
  * et al., "Mergeable Summaries", PODS'12), which is exactly the
  * map-side-combine shape Spark's partial aggregation needs: shuffle
  * volume is O(partitions × k), never O(distinct tokens).
  *
  * The sketch yields CANDIDATES (a superset of the true heavy hitters);
  * callers confirm exact counts with a second, candidate-filtered pass —
  * see `q92_heavy_hitters`.
  */
object FrequentItems {

  final case class MGBuf(m: Map[String, Long])

  class MisraGries(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k > 0, "k must be positive")
    private val cap = 2 * k

    /** Subtract the (k+1)-th largest count from everything, drop the dead. */
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        val t = m.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(k)
        m.collect { case (key, c) if c > t => key -> (c - t) }
      }

    override def zero: MGBuf = MGBuf(Map.empty)
    override def reduce(b: MGBuf, tok: String): MGBuf = {
      val m = b.m.updated(tok, b.m.getOrElse(tok, 0L) + 1L)
      MGBuf(if (m.size > cap) trim(m) else m)
    }
    override def merge(a: MGBuf, b: MGBuf): MGBuf =
      MGBuf(trim(b.m.foldLeft(a.m) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }))
    override def finish(b: MGBuf): Map[String, Long] = trim(b.m)
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
