package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are usable from plain SQL once registered —
  * the SparkSessionExtensions / function-registry integration path. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("extensions-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("custom expressions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  kusto_decimal_plain(CAST(0.0000001 AS DECIMAL(20,7))) AS dec,
        |  kusto_double_text(CAST(3.0 AS DOUBLE)) AS dt,
        |  kusto_double_csv(CAST(3.0 AS DOUBLE)) AS dc,
        |  kusto_bytes_array(CAST('AB' AS BINARY)) AS ba,
        |  kusto_json(named_struct('b', 1, 'a', 'x')) AS js,
        |  simhash64(array('a', 'b')) AS sh,
        |  rolling_hash64('ab') AS rh,
        |  divide_unsigned(-1000000L, 1000L) AS du,
        |  divide_unsigned(7L, 0L) AS dz
      """.stripMargin).collect().head
    assert(r.getString(0) == "0.0000001")
    assert(r.getString(1) == "3.0")
    assert(r.getString(2) == "3")
    assert(r.getSeq[Int](3) == Seq(65, 66))
    assert(r.getString(4) == """{"a":"x","b":1}""") // sorted keys
    assert(r.getLong(6) == 'a'.toLong * 31 + 'b'.toLong)
    assert(r.getLong(7) == java.lang.Long.divideUnsigned(-1000000L, 1000L))
    assert(r.isNullAt(8)) // /0 -> null, try_divide convention
  }

  test("vec_dot equals the HOF fold bit-for-bit, incl. null/mismatch semantics") {
    // the codegen'd expression replaced aggregate(zip_with(...)) in the
    // vector family; the DuckDB hash gates stay green only if the IEEE
    // rounding sequence is IDENTICAL — pin equality on irrational-heavy
    // doubles where any reordering would flip low bits, and pin the HOF's
    // null semantics (either side null, length mismatch, null element)
    val r = spark.sql(
      """WITH v AS (SELECT
        |  transform(sequence(1, 64), i -> sqrt(CAST(i AS DOUBLE)) / 7.0) AS a,
        |  transform(sequence(1, 64), i -> ln(CAST(i + 1 AS DOUBLE)) * 3.0) AS b)
        |SELECT
        |  vec_dot(a, b) = aggregate(zip_with(a, b, (x, y) -> x * y),
        |    0.0D, (acc, x) -> acc + x) AS same,
        |  vec_dot(a, b) AS vd,
        |  vec_dot(CAST(NULL AS ARRAY<DOUBLE>), a) AS n1,
        |  vec_dot(a, slice(b, 1, 10)) AS n2,
        |  vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS n3,
        |  vec_dot(CAST(array() AS ARRAY<DOUBLE>),
        |    CAST(array() AS ARRAY<DOUBLE>)) AS empty
        |FROM v""".stripMargin).collect().head
    assert(r.getBoolean(0), "vec_dot diverged from the HOF fold")
    assert(!r.isNullAt(1) && r.getDouble(1) > 0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getDouble(5) == 0.0)
  }

  test("divide_unsigned rejects non-bigint inputs at analysis time") {
    val e = intercept[Exception](
      spark.sql("SELECT divide_unsigned('a', 'b')").collect())
    assert(e.getMessage.contains("divide_unsigned requires (bigint, bigint)"),
      e.getMessage)
  }

  test("registered functions run distributed over a table scan") {
    val n = spark.sql(
      """SELECT rolling_hash64(text) AS h
        |FROM parquet.`/root/testdata/sf0.001/documents.parquet`
      """.stripMargin).filter("h IS NOT NULL").count()
    assert(n == 500)
  }
}
