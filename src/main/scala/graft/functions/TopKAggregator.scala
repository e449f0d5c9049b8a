package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k per group as a typed `Aggregator` — the scalable
  * alternative to `row_number().over(window) <= k`: the window form sorts
  * every group's full row set inside each partition, while this keeps at
  * most k (score, id) pairs per partial buffer and merges them map-side,
  * so the shuffle carries O(groups × k) regardless of group size. Ties
  * break toward the smaller id (matching `ORDER BY score DESC, id ASC`),
  * which keeps the result deterministic and window-oracle-comparable.
  */
object TopKAggregator {

  final case class TopKBuf(scores: Array[Double], ids: Array[Long])

  class TopK(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
    require(k > 0, "k must be positive")

    /** (score, id) wins over (s2, i2) under DESC score, ASC id. */
    private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean =
      s > s2 || (s == s2 && i < i2)

    /** Keep the k best pairs of the concatenation (selection by sort —
      * buffers are ≤ 2k elements, so this is O(k log k) per merge). */
    private def best(scores: Array[Double], ids: Array[Long]): TopKBuf = {
      val order = scores.indices.sortWith((a, b) =>
        beats(scores(a), ids(a), scores(b), ids(b))).take(k)
      TopKBuf(order.map(scores).toArray, order.map(ids).toArray)
    }

    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)
    override def reduce(b: TopKBuf, v: (Double, Long)): TopKBuf =
      if (b.scores.length < k)
        best(b.scores :+ v._1, b.ids :+ v._2)
      else if (beats(v._1, v._2, b.scores(k - 1), b.ids(k - 1)))
        best(b.scores :+ v._1, b.ids :+ v._2)
      else b
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      best(a.scores ++ b.scores, a.ids ++ b.ids)
    override def finish(b: TopKBuf): Seq[(Double, Long)] =
      b.scores.zip(b.ids).toSeq
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }
}
