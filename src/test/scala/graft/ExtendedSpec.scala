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

  test("q104 exact_med is DoubleType (not decimal) — driver hash-gate repr pin") {
    // Round-10 red row: Spark's bare `... / 100.0` literal is DECIMAL, so
    // the division produced decimal(27,6) while the DuckDB oracle's
    // `/ 100.0` is DOUBLE — values equal, stringified reprs differ
    // ("52840.440000" vs "52840.44"), driver hash failed. The engine now
    // casts to DOUBLE before dividing; pin the output schema so a future
    // rewrite can't regress the repr.
    import org.apache.spark.sql.types.{BooleanType, DecimalType, DoubleType}
    val schema = SparkEntry.queries("q104_approx_percentile")(spark, dir).schema
    assert(schema("exact_med").dataType == DoubleType,
      s"exact_med must be DOUBLE to match the oracle repr, got ${schema("exact_med").dataType}")
    assert(schema("apx_ok").dataType == BooleanType)
    assert(!schema.exists(_.dataType.isInstanceOf[DecimalType]),
      "no q104 output column may be decimal-typed")
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
