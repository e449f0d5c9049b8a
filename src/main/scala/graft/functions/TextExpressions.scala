package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  // Codegen emits a static call instead of falling back: the expression
  // stays inside the whole-stage-codegen span of q36's hot projection
  // (a CodegenFallback here would interpret the WHOLE projection per row).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static so generated code can call it directly. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
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
}

/** Rolling polynomial fingerprint of a string (Rabin-Karp style):
  * `h = Σ byte_i * B^(n-1-i) mod 2^64` with B = 31. Content-defined and
  * incremental — the building block for shift-resistant chunk
  * fingerprinting of large documents. Input StringType, output LongType.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  /** Static so generated code can call it directly. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }
}

/** FNV-1a of a string's UTF-8 bytes as a SQL-callable expression (the
  * [[Fnv64]] fold [[SimHash64]] already uses per token). Chosen over
  * Spark's xxhash64 for the fuzzy-dedup shingle keys because it is
  * ENGINE-INDEPENDENT: a byte-at-a-time fold whose multiplier fits in
  * 40 bits, so the DuckDB oracle replicates it exactly in HUGEINT
  * arithmetic and the MinHash pair list gets a full row-level oracle
  * instead of a contract-tier boolean gate. Input StringType, output
  * LongType.
  */
case class Fnv64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Fnv64.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}

/** Fused bigram-key projection (r17): array<string> tokens ->
  * SORTED DISTINCT array<bigint> of FNV-1a keys of the adjacent-token
  * bigrams "x y" — bit-identical to
  * `array_sort(array_distinct(transform(zip_with(slice(tk,1,n-1),
  * slice(tk,2,n-1), (x,y) -> concat(x,' ',y)), h -> fnv64(h))))` (the
  * tokenSetsOf chain), computed WITHOUT materializing any bigram
  * string: the FNV fold runs over x's bytes, one 0x20 space byte, then
  * y's bytes, which is exactly the byte stream of concat(x,' ',y). The
  * old chain allocated ~n UTF8String concats plus three intermediate
  * arrays per row — measured 1.9 s of the q161 tokenSets build at
  * sf0.1 in one scan pass. Null contract mirrors the chain: a null
  * token makes its bigram's key null (concat -> null, fnv64 -> null);
  * distinct keeps one null and array_sort places it last. A null or
  * sub-2-token array yields the same empty/dropped result the CASE
  * yielded (callers filter size > 0 either way).
  */
case class BigramKeys(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigram_keys requires array<string>, got ${t.catalogString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    BigramKeys.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramKeys.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramKeys =
    copy(child = newChild)
}

object BigramKeys {
  /** Static so generated code calls it directly. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val keys = new Array[Long](n - 1)
    var m = 0
    var hasNull = false
    var i = 0
    while (i < n - 1) {
      if (arr.isNullAt(i) || arr.isNullAt(i + 1)) hasNull = true
      else {
        val a = arr.getUTF8String(i).getBytes
        val b = arr.getUTF8String(i + 1).getBytes
        var h = Fnv64.Offset
        var j = 0
        while (j < a.length) { h = (h ^ (a(j) & 0xffL)) * Fnv64.Prime; j += 1 }
        h = (h ^ 0x20L) * Fnv64.Prime // the ' ' separator byte
        j = 0
        while (j < b.length) { h = (h ^ (b(j) & 0xffL)) * Fnv64.Prime; j += 1 }
        keys(m) = h
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(keys, 0, m)
    var w = 0
    var r = 0
    while (r < m) { // in-place dedup of the sorted run
      if (w == 0 || keys(r) != keys(w - 1)) { keys(w) = keys(r); w += 1 }
      r += 1
    }
    val out = new Array[Any](w + (if (hasNull) 1 else 0))
    var k = 0
    while (k < w) { out(k) = keys(k); k += 1 }
    // a trailing slot (if any bigram had a null member) stays null —
    // exactly where array_sort places the single distinct null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Murmur3's 64-bit finalizer (fmix64, public domain — Appleby's
  * MurmurHash3 / splitmix64 mixer): full-avalanche bijection on 64 bits.
  * Composes the MinHash family `mix64(h ^ seed_j)` — FNV alone mixes too
  * weakly for min-order statistics, and fmix64's two 64-bit multiplies
  * are still DuckDB-replicable by 32-bit-split multiplication mod 2^64.
  * Input LongType, output LongType; Java's wrapping multiply IS the
  * mod-2^64 semantics (no ANSI overflow — that is why this is an
  * Expression and not a SQL arithmetic chain).
  */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Mix64.compute(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mix64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  /** Static so generated code can call it directly. */
  def compute(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}

object TextFunctions {
  private def expr2col(e: Expression): Column = org.apache.spark.sql.GraftShims.column(e)
  private def col2expr(c: Column): Expression = org.apache.spark.sql.GraftShims.expression(c)

  def simhash64(tokens: Column): Column = expr2col(SimHash64(col2expr(tokens)))
  def rollingHash64(text: Column): Column = expr2col(RollingHash64(col2expr(text)))
  def fnv64(text: Column): Column = expr2col(Fnv64Expr(col2expr(text)))
  def mix64(h: Column): Column = expr2col(Mix64(col2expr(h)))
}
