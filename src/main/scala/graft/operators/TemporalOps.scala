package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of join: for each left row, attach the latest right row
  * with `right.time <= left.time` within the same key (the time-series
  * "most recent quote for this trade" join).
  *
  * Shape: tag both inputs, union, and carry the latest right row forward
  * with a running `last(ignoreNulls)` over one key-partitioned window.
  * Each input row is shuffled exactly once on the key and no (left,
  * right-candidate) pair is ever materialized — the naive equi-join-then-
  * prune plan explodes by the per-key right cardinality before pruning,
  * which is the difference between O(n) and O(n·m) shuffle at 100 TB.
  * Right rows sort before left rows at equal timestamps, giving `<=`
  * (ASOF) semantics.
  *
  * The matched right row travels as ONE struct, so its columns stay
  * consistent (a null value inside the matched row is returned as null,
  * not skipped for an older non-null — row-level, not per-column,
  * carry-forward). Right rows should be unique per (key, time): ties at
  * the same instant are otherwise resolved arbitrarily (pre-aggregate
  * the right side to make them deterministic, as q26 does).
  */
object TemporalOps {

  /** Returns every left row plus `asof_<col>` for each non-key right
    * column (null where no right row is at-or-before the left time). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val rCols = right.columns.filterNot(_ == key).toSeq
    val lCols = left.columns.toSeq
    val reserved = Set("__t", "__kind", "__r", "__asof")
    val clash = (lCols ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename ${clash.distinct.mkString(", ")} in the inputs")
    val outClash = lCols.toSet.intersect(rCols.map("asof_" + _).toSet)
    require(outClash.isEmpty,
      s"asofJoin outputs asof_<rightCol> columns; left already has " +
        s"${outClash.mkString(", ")} — rename them in one input")
    val rTagged = right.select(
      col(key) +: col(rightTime).as("__t") +: lit(0).as("__kind") +:
        struct(rCols.map(col): _*).as("__r") +:
        lCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      col(key) +: col(leftTime).as("__t") +: lit(1).as("__kind") +:
        lit(null).cast(rTagged.schema("__r").dataType).as("__r") +:
        lCols.filterNot(_ == key).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(lCols.map(col) ++ rCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
