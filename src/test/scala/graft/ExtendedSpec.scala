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

  test("approx_count_distinct (HLL++) within 3x rsd of exact counts") {
    // The query self-verifies the sketch against the exact distinct count
    // and emits the verdict as hll_ok (the DuckDB oracle pins TRUE); here
    // we assert the verdict held for every group.
    val rows = SparkEntry.queries("q45_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getBoolean(r.fieldIndex("hll_ok")),
        s"${r.getString(0)}: HLL++ estimate outside 3x rsd of exact")
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
