package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-count sketch state as a typed
  * `Aggregator`: the k smallest DISTINCT hash values per group under
  * UNSIGNED 64-bit order (Bar-Yossef et al. 2002, the mergeable
  * bottom-k form). Unlike Spark's built-in HLL++ (whose register
  * layout no external engine can re-derive, keeping q45/q97/q104 on
  * the contract tier), the KMV state is a plain value set: an oracle
  * recomputes it exactly with ORDER BY unsigned-hash LIMIT k, so the
  * estimate is row-level verifiable. Buffer is at most k longs;
  * duplicates collapse in `best` (a multiset and its set have the same
  * KMV by construction), merges are map-side, the exchange carries
  * O(groups × k).
  */
object KmvAggregator {

  final case class KmvBuf(vs: Array[Long])

  class KMinLongs(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    require(k > 0, "k must be positive")

    private def lt(a: Long, b: Long): Boolean =
      java.lang.Long.compareUnsigned(a, b) < 0

    private def best(vs: Array[Long]): Array[Long] =
      vs.distinct.sortWith(lt).take(k)

    override def zero: KmvBuf = KmvBuf(Array.empty)
    override def reduce(b: KmvBuf, v: Long): KmvBuf =
      if (b.vs.length < k || lt(v, b.vs(b.vs.length - 1)))
        KmvBuf(best(b.vs :+ v))
      else b
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
      KmvBuf(best(a.vs ++ b.vs))
    override def finish(b: KmvBuf): Seq[Long] = b.vs.toSeq
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
