package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.2 "UDF/UDAF/UDTF" row): a custom
  * `Aggregator[IN, BUF, OUT]` computing the element-wise mean of embedding
  * vectors — the centroid step of an IVF (inverted-file) ANN index. Runs
  * with partial aggregation (map-side combine) like any built-in agg: the
  * buffer is one (sum vector, count) per partition per group, so shuffle
  * volume is O(groups x dim), not O(rows).
  */
object VectorAggregators {

  final case class CentroidBuf(sum: Array[Double], n: Long)

  class Centroid(dim: Int) extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)
    override def reduce(b: CentroidBuf, v: Seq[Double]): CentroidBuf = {
      var i = 0
      while (i < dim) { b.sum(i) += v(i); i += 1 }
      CentroidBuf(b.sum, b.n + 1)
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sum(i) += b.sum(i); i += 1 }
      CentroidBuf(a.sum, a.n + b.n)
    }
    override def finish(b: CentroidBuf): Seq[Double] =
      if (b.n == 0) Seq.fill(dim)(0.0) else b.sum.toSeq.map(_ / b.n)
    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
