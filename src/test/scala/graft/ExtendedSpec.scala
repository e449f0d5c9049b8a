package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Extended operator semantics not coverable by the DuckDB oracle. */
class ExtendedSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("extended-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("approx_count_distinct (HLL++) within 5% of exact counts") {
    val approx = SparkEntry.queries("q45_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("cube emits all four grouping combinations") {
    val rows = SparkEntry.queries("q42_cube")(spark, dir).collect()
    val hasGrandTotal = rows.exists(r => r.isNullAt(0) && r.isNullAt(1))
    val hasStatusOnly = rows.exists(r => !r.isNullAt(0) && r.isNullAt(1))
    val hasPrioOnly = rows.exists(r => r.isNullAt(0) && !r.isNullAt(1))
    val hasBoth = rows.exists(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(hasGrandTotal && hasStatusOnly && hasPrioOnly && hasBoth)
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).head.getLong(2)
    assert(total == Tables(spark, dir, "orders").count())
  }
}
