package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end goldens for NESTED parquet through the real CLI path: a
  * struct/array/map/decimal/binary/date fixture file is written to disk,
  * read back by `Pq2Json.run` (so the full spark.read.parquet -> render ->
  * stdout pipeline runs), and the JSONL and CSV text is compared against
  * lines hand-derived from the reference's conversion code:
  *
  *   - object/list/map recursion  `/root/reference/pq2json/src/converter.rs:214-281`
  *   - bytes -> number array      `converter.rs:283-289`
  *   - decimal plain string       `converter.rs:345-371`
  *   - CSV value stringification  `converter.rs:190-212` (nested values embed
  *     as serde_json text; floats get the trailing-zero strip, including the
  *     reproduced "1e300" -> "1e3" corruption)
  *   - prune cascade: omit-nulls + empty-bag/empty-list -> null -> omitted
  *     (`converter.rs:220-244`); NOTE binary arrays come from bytes_to_value,
  *     which never participates in empty-list pruning — [] survives --prune.
  */
class NestedGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  @transient var fixtureDir: String = _

  private val schema = StructType(Seq(
    StructField("s", StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", StructType(Seq(StructField("c", StringType))))))),
    StructField("l", ArrayType(IntegerType)),
    StructField("m", MapType(StringType, IntegerType)),
    StructField("mik", MapType(IntegerType, StringType)),
    StructField("x", DecimalType(38, 10)),
    StructField("bin", BinaryType),
    StructField("dt", DateType),
    StructField("f", DoubleType)))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("nested-golden-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    fixtureDir = java.nio.file.Files.createTempDirectory("nested-fixture").toString
    val rows = java.util.List.of(
      Row(Row(1, Row("hi")), Seq(1, 2), Map("k" -> 1, "a,b" -> 2),
        Map(7 -> "seven"), new java.math.BigDecimal("1234.5"),
        Array[Byte](0, -1), java.sql.Date.valueOf("2024-01-02"), 0.1),
      Row(null, null, null, null, null, null, null, null),
      Row(Row(null, null), Seq.empty[Int], Map.empty[String, Int],
        Map.empty[Int, String], new java.math.BigDecimal("-0.25"),
        Array.empty[Byte], java.sql.Date.valueOf("1970-01-01"), 1e300))
    // one partition -> one parquet file -> scan order == insertion order
    spark.createDataFrame(rows, schema).coalesce(1)
      .write.mode("overwrite").parquet(fixtureDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def capture(args: Array[String]): Array[String] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    Pq2Json.run(spark, Pq2Json.parseArgs(args), ps)
    // every record (JSONL and CSV alike) is terminated by the final "\n"
    bos.toString("UTF-8").split("\n", -1).dropRight(1)
  }

  test("nested parquet -> JSONL: recursion, sorted keys, decimal/bytes/date") {
    val got = capture(Array(fixtureDir))
    assert(got.length == 3)
    assert(got(0) == """{"bin":[0,255],"dt":"2024-01-02","f":0.1,"l":[1,2],""" +
      """"m":{"a,b":2,"k":1},"mik":{"7":"seven"},"s":{"a":1,"b":{"c":"hi"}},""" +
      """"x":"1234.5000000000"}""")
    assert(got(1) == """{"bin":null,"dt":null,"f":null,"l":null,"m":null,""" +
      """"mik":null,"s":null,"x":null}""")
    assert(got(2) == """{"bin":[],"dt":"1970-01-01","f":1e300,"l":[],"m":{},""" +
      """"mik":{},"s":{"a":null,"b":null},"x":"-0.2500000000"}""")
  }

  test("nested parquet -> JSONL --prune: null/empty cascade collapses rows to {}") {
    val got = capture(Array("--prune", fixtureDir))
    assert(got.length == 3)
    assert(got(0) == """{"bin":[0,255],"dt":"2024-01-02","f":0.1,"l":[1,2],""" +
      """"m":{"a,b":2,"k":1},"mik":{"7":"seven"},"s":{"a":1,"b":{"c":"hi"}},""" +
      """"x":"1234.5000000000"}""")
    assert(got(1) == "{}") // all-null row -> pruned empty bag -> {} (converter.rs:135-139)
    // s: all-null fields -> empty bag -> null -> omitted; l/m/mik empty ->
    // null -> omitted; bin [] SURVIVES (bytes_to_value, not list_to_value)
    assert(got(2) == """{"bin":[],"dt":"1970-01-01","f":1e300,"x":"-0.2500000000"}""")
  }

  test("nested parquet -> CSV: JSON-embedded nesting, quoting, float zero-strip") {
    val got = capture(Array("--csv", fixtureDir))
    assert(got.length == 3)
    assert(got(0) == "\"{\"\"a\"\":1,\"\"b\"\":{\"\"c\"\":\"\"hi\"\"}}\"," +
      "\"[1,2]\",\"{\"\"a,b\"\":2,\"\"k\"\":1}\",\"{\"\"7\"\":\"\"seven\"\"}\"," +
      "1234.5000000000,\"[0,255]\",2024-01-02,0.1\r")
    assert(got(1) == ",,,,,,,\r") // 8 null fields -> 7 bare commas
    assert(got(2) == "\"{\"\"a\"\":null,\"\"b\"\":null}\"," +
      "[],{},{},-0.2500000000,[],1970-01-01,1e3\r") // "1e300"->"1e3" quirk
  }

  test("nested parquet -> CSV with --columns: missing column = empty slot in place") {
    val got = capture(Array("--csv", "-c", """["l","nope","f"]""", fixtureDir))
    assert(got.length == 3)
    assert(got(0) == "\"[1,2]\",,0.1\r")
    assert(got(2) == "[],,1e3\r")
  }
}
