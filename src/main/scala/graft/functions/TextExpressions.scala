package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit FNV-1a over UTF-8 bytes. Used by the text-dedup
  * expressions below; self-contained so results are stable across Spark
  * versions (no dependence on Spark's internal hash implementations).
  */
object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L
  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * Prime; i += 1 }
    h
  }
  def hash(s: UTF8String): Long = hash(s.getBytes)
  def hash(s: String): Long = hash(s.getBytes("UTF-8"))
}

/** 64-bit SimHash over an array of tokens: each token hashes to 64 bits;
  * per bit position, set tokens vote +1 and unset tokens -1; the output bit
  * is 1 where the vote is positive (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms"). Near-duplicate documents differ
  * in few token votes, so their SimHashes are close in Hamming distance.
  *
  * Input: ArrayType(StringType). Output: LongType. Distinct tokens only —
  * dedup semantics follow set similarity, not multiset.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Fnv64.hash(arr.getUTF8String(i))
        if (seen.add(h)) {
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint of a string (Rabin-Karp style):
  * `h = Σ byte_i * B^(n-1-i) mod 2^64` with B = 31. Content-defined and
  * incremental — the building block for shift-resistant chunk
  * fingerprinting of large documents. Input StringType, output LongType.
  */
case class RollingHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object TextFunctions {
  private def expr2col(e: Expression): Column = org.apache.spark.sql.GraftShims.column(e)
  private def col2expr(c: Column): Expression = org.apache.spark.sql.GraftShims.expression(c)

  def simhash64(tokens: Column): Column = expr2col(SimHash64(col2expr(tokens)))
  def rollingHash64(text: Column): Column = expr2col(RollingHash64(col2expr(text)))
}
