package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two array<double> columns — the hot inner
  * loop of the whole vector family (kNN q37, embedding dedup q38/q114,
  * matryoshka q89, IVF q46, semantic decontam q127). The SQL
  * higher-order-function form `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0.0D, (acc,x) -> acc+x)` evaluates lambdas interpretively per element
  * and allocates the zipped array per PAIR — this expression is one
  * fused primitive loop inside the whole-stage-codegen span.
  *
  * Bit-identical to the HOF it replaces (which is what keeps the DuckDB
  * hash gates green): products and the accumulating sum run left-to-right
  * in element order, starting from +0.0, so the IEEE rounding sequence is
  * the same. Null semantics match too: null when either array is null,
  * when lengths differ (zip_with pads the shorter side with null), or
  * when any element is null; empty arrays give 0.0.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "vec_dot requires (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VecDot.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("vecDot")
      s"""
        java.lang.Double $d = graft.functions.VecDot.compute($a, $b);
        if ($d == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $d.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Static so generated code calls it directly; boxed return carries the
    * null-on-mismatch/null-element result (one box per pair — noise next
    * to the per-element lambda dispatch it replaces). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Codegen'd overlap count over two SORTED-ascending array<bigint>
  * columns — the verify loop of the prefix-filter similarity join
  * (q161). `size(array_intersect(a, b))` builds a hash set per ROW
  * (allocation dominates at millions of candidate pairs; measured ~38 us
  * per pair at sf0.1); with both sides sorted once at tokenization this
  * is a zero-allocation two-pointer merge, O(|a|+|b|) comparisons per
  * pair inside the whole-stage-codegen span.
  *
  * Precondition: both arrays sorted ascending with distinct elements
  * (array_sort(array_distinct(...)) upstream) — under it the count
  * equals |set(a) ∩ set(b)| exactly. Null ARRAY -> null. Null ELEMENTS
  * -> null is a FULL contract under the sort precondition (ADVICE r10
  * close): array_sort places nulls LAST, so an O(1) last-element check
  * at entry detects any null element even when the merge scan would
  * exit early with one side exhausted; the in-loop check covers any
  * null a caller smuggles in out of order AND reached by the scan. An
  * unsorted input with an unreached interior null violates the
  * precondition and is the caller's bug, same as unsorted values.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    SortedIntersectCount.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("sic")
      s"""
        java.lang.Long $c = graft.functions.SortedIntersectCount.compute($a, $b);
        if ($c == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $c.longValue(); }
      """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntersectCount]] with a reachability lower bound (r16): the
  * prefix-filter verify loop runs on MILLIONS of candidate pairs of
  * which only a fraction pass the threshold `inter >= m`, and for a
  * failing pair most of the merge scan is spent proving a count that
  * will be discarded. This form early-exits the moment the running
  * count plus the shorter remaining side can no longer reach `m` and
  * returns -1 — a sentinel strictly below any m >= 0, so the caller's
  * threshold filter drops the row exactly as it would have with the
  * exact (sub-m) count. For pairs that CAN reach m the scan completes
  * and the result is the exact overlap (bit-identical to the 2-arg
  * form) — surviving rows' emitted n_shared/jac never change, which is
  * what keeps the oracle hash gates green. Null/sortedness contract
  * identical to [[SortedIntersectCount]]; null m -> null.
  */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_atleast requires (array<bigint>, array<bigint>," +
          s" bigint), got (${first.dataType.catalogString}," +
          s" ${second.dataType.catalogString}," +
          s" ${third.dataType.catalogString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val l = first.eval(input)
    if (l == null) return null
    val r = second.eval(input)
    if (r == null) return null
    val m = third.eval(input)
    if (m == null) return null
    SortedIntersectCount.computeAtLeast(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      m.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val c = ctx.freshName("sial")
      s"""
        java.lang.Long $c = graft.functions.SortedIntersectCount.computeAtLeast($a, $b, $m);
        if ($c == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $c.longValue(); }
      """
    })
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SortedIntersectAtLeast =
    copy(first = f, second = s, third = t)
}

object SortedIntersectCount {
  /** [[SortedIntersectAtLeast]]'s loop: exact overlap when it can reach
    * `m`, -1 on early exit (count provably below m), null contract as
    * [[compute]]. Static so generated code calls it directly. */
  def computeAtLeast(a: ArrayData, b: ArrayData, m: Long): java.lang.Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na > 0 && a.isNullAt(na - 1)) return null
    if (nb > 0 && b.isNullAt(nb - 1)) return null
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      // null backstop BEFORE the early exit (ADVICE r16): on
      // contract-violating input (a null mid-array under a non-null
      // tail, i.e. unsorted) the 2-arg form returns null at the first
      // null element — exiting -1 first would diverge from that
      // documented identical null contract
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      if (n + math.min(na - i, nb - j) < m) return java.lang.Long.valueOf(-1L)
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(n)
  }

  /** Static so generated code calls it directly (see [[VecDot.compute]]). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements()
    val nb = b.numElements()
    // array_sort places nulls last, so the last element being non-null
    // proves the whole (sorted) array is null-free — the merge scan can
    // then exit early without forfeiting the null-element -> null
    // contract (see the class doc).
    if (na > 0 && a.isNullAt(na - 1)) return null
    if (nb > 0 && b.isNullAt(nb - 1)) return null
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(n)
  }
}
