package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two keys — the multi-column data-skipping
  * sort for 100 TB scans. Sorting by a single column gives parquet
  * row-group min/max stats that prune scans on that column only; sorting
  * by the Z-curve key keeps BOTH columns locally clustered, so row-group
  * stats prune point/range filters on either column (the technique behind
  * Delta/Iceberg Z-ORDER clustering). ScaleSpec measures the pruning on
  * real footer statistics.
  *
  * Contract: interleaves the LOW 32 bits of each input (bit i of `left`
  * lands at 2i, of `right` at 2i+1). Callers map values into that domain
  * first — ids directly, wide/skewed domains via bucketing or rank. Both
  * inputs must already be bigint.
  */
case class ZorderKey(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "zorder_key requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    ZorderKey.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZorderKey.interleave($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderKey =
    copy(left = newLeft, right = newRight)
}

object ZorderKey {
  /** Spread the low 32 bits of x to even bit positions (standard Morton). */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static so generated code can call it directly. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  private def expr2col(e: Expression): Column = org.apache.spark.sql.GraftShims.column(e)
  private def col2expr(c: Column): Expression = org.apache.spark.sql.GraftShims.expression(c)

  def zorderKey(a: Column, b: Column): Column =
    expr2col(ZorderKey(col2expr(a), col2expr(b)))
}
