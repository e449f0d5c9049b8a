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

  final case class CentroidFixedBuf(sum: Array[Long], n: Long)

  /** Order-independent centroid: components accumulate as FIXED-POINT
    * longs (floor(x * 2^32)), so the sum is exact integer arithmetic and
    * the result is bit-identical regardless of partitioning, merge order,
    * or task retries — double summation is associative-only-on-paper, and
    * a cross-engine hash gate (q46's DuckDB oracle) needs determinism,
    * not just closeness. Precision: 2^-32 per component per row; range:
    * |x| <= 0.5 embeddings overflow a long only past ~4e9 rows per group
    * (shard groups before that) — and accumulation is addExact, so
    * hitting that bound RAISES instead of silently corrupting centroids
    * while the oracle's HUGEINT sum stays exact. floor, not round:
    * round's half-tie behavior differs between engines (HALF_UP vs
    * half-away-from-zero); floor is unambiguous everywhere. */
  class CentroidFixed(dim: Int) extends Aggregator[Seq[Double], CentroidFixedBuf, Seq[Double]] {
    private val Scale = 4294967296.0 // 2^32
    override def zero: CentroidFixedBuf = CentroidFixedBuf(new Array[Long](dim), 0L)
    override def reduce(b: CentroidFixedBuf, v: Seq[Double]): CentroidFixedBuf = {
      var i = 0
      while (i < dim) {
        b.sum(i) = Math.addExact(b.sum(i), math.floor(v(i) * Scale).toLong)
        i += 1
      }
      CentroidFixedBuf(b.sum, b.n + 1)
    }
    override def merge(a: CentroidFixedBuf, b: CentroidFixedBuf): CentroidFixedBuf = {
      var i = 0
      while (i < dim) { a.sum(i) = Math.addExact(a.sum(i), b.sum(i)); i += 1 }
      CentroidFixedBuf(a.sum, a.n + b.n)
    }
    override def finish(b: CentroidFixedBuf): Seq[Double] =
      if (b.n == 0) Seq.fill(dim)(0.0)
      // exactly `CAST(s AS DOUBLE) / 4294967296.0 / n` — keep the op
      // sequence in lockstep with the DuckDB oracle's
      else b.sum.toSeq.map(l => l.toDouble / Scale / b.n)
    override def bufferEncoder: Encoder[CentroidFixedBuf] = Encoders.product[CentroidFixedBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  final case class PcaMomentsBuf(sp: Array[Long], m: Array[Long], n: Long)
  final case class PcaMomentsOut(sp: Seq[Long], m: Seq[Long], n: Long)

  /** q171's covariance moments in ONE corpus pass: count, per-dim sums,
    * and the full d x d outer-product sum folded row-locally into a
    * d²-long buffer — shuffle volume is O(partitions x d²), never rows
    * (the explode-then-hash-agg formulation materialized d² rows PER
    * VECTOR before the partial agg and dominated the query). Exact:
    * inputs are 2^16-grid integers so each product fits well inside a
    * long, and accumulation is add/multiplyExact — past ~5e8 rows per
    * group the sum RAISES instead of silently corrupting (the
    * CentroidFixed convention; shard first at that scale) while the
    * DuckDB oracle's HUGEINT sums stay exact and equal in range. */
  class PcaMoments(dim: Int)
      extends Aggregator[Seq[Long], PcaMomentsBuf, PcaMomentsOut] {
    override def zero: PcaMomentsBuf =
      PcaMomentsBuf(new Array[Long](dim * dim), new Array[Long](dim), 0L)
    override def reduce(b: PcaMomentsBuf, f: Seq[Long]): PcaMomentsBuf = {
      val a = f.toArray
      var i = 0
      while (i < dim) {
        val x = a(i)
        b.m(i) = Math.addExact(b.m(i), x)
        val row = i * dim
        var j = 0
        while (j < dim) {
          b.sp(row + j) = Math.addExact(b.sp(row + j), Math.multiplyExact(x, a(j)))
          j += 1
        }
        i += 1
      }
      PcaMomentsBuf(b.sp, b.m, b.n + 1)
    }
    override def merge(a: PcaMomentsBuf, b: PcaMomentsBuf): PcaMomentsBuf = {
      var k = 0
      while (k < dim * dim) { a.sp(k) = Math.addExact(a.sp(k), b.sp(k)); k += 1 }
      var i = 0
      while (i < dim) { a.m(i) = Math.addExact(a.m(i), b.m(i)); i += 1 }
      PcaMomentsBuf(a.sp, a.m, a.n + b.n)
    }
    override def finish(b: PcaMomentsBuf): PcaMomentsOut =
      PcaMomentsOut(b.sp.toSeq, b.m.toSeq, b.n)
    override def bufferEncoder: Encoder[PcaMomentsBuf] = Encoders.product[PcaMomentsBuf]
    override def outputEncoder: Encoder[PcaMomentsOut] = Encoders.product[PcaMomentsOut]
  }
}
