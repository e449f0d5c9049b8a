package graft

import graft.functions.{KustoRender, KustoRenderOptions}
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Real-file fixtures for the physical types Spark itself cannot write:
  * UINT64/UINT32 columns (via parquet-hadoop's ExampleParquetWriter, which
  * is already on the Spark classpath) and INT96 timestamps (via Spark's
  * legacy writer flag). Pins the full chain — parquet footer -> Spark
  * schema -> Kusto render — against the reference's semantics:
  *
  *   - u64 -> i64 two's-complement reinterpret under `--convert-types`
  *     (`/root/reference/pq2json/src/converter.rs:297-303`)
  *   - u64 without convert-types renders the unsigned value
  *     (`converter.rs:122` u64 into a serde_json Number)
  *   - `--cslschema`: INT64(unsigned) -> "long", INT32(unsigned) -> "int"
  *     (the catch-all arms at `schema.rs:96,101`), INT96 -> "datetime"
  *     (`schema.rs:103`)
  */
class UnsignedIntFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  @transient var uintFile: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("unsigned-fixture-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("uint-fixture").toString
    uintFile = s"$dir/uint.parquet"
    val schema = MessageTypeParser.parseMessageType(
      """message m {
        |  required int64 u64 (INTEGER(64,false));
        |  required int32 u32 (INTEGER(32,false));
        |}""".stripMargin)
    val writer = ExampleParquetWriter.builder(new Path(uintFile))
      .withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try {
      // raw bits: -1L IS u64::MAX, Long.MinValue IS i64::MAX+1, -1 IS u32::MAX
      writer.write(f.newGroup().append("u64", -1L).append("u32", -1))
      writer.write(f.newGroup().append("u64", Long.MinValue).append("u32", 7))
      writer.write(f.newGroup().append("u64", 42L).append("u32", 0))
    } finally writer.close()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def capture(args: Array[String]): Array[String] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    Pq2Json.run(spark, Pq2Json.parseArgs(args), ps)
    bos.toString("UTF-8").split("\n", -1).dropRight(1)
  }

  test("Spark reads parquet UINT64 as Decimal(20,0), UINT32 as Long — unsigned values intact") {
    val df = spark.read.parquet(uintFile).orderBy(org.apache.spark.sql.functions.col("u32"))
    assert(df.schema("u64").dataType == DecimalType(20, 0))
    assert(df.schema("u32").dataType == LongType)
    val rows = spark.read.parquet(uintFile).collect()
      .map(r => (r.getDecimal(0).toBigInteger.toString, r.getLong(1))).toSet
    assert(rows == Set(("18446744073709551615", 4294967295L),
      ("9223372036854775808", 7L), ("42", 0L)))
  }

  test("u64 reinterpret against a REAL uint64 file (converter.rs:297-303)") {
    val df = spark.read.parquet(uintFile)
    val got = df.select(KustoRender.u64ToLong(df.col("u64")).as("l"), df.col("u32"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((-1L, 4294967295L), (Long.MinValue, 7L), (42L, 0L)))
  }

  test("Pq2Json on a uint64 file: -r renders reinterpreted i64 numbers") {
    val conv = capture(Array("-r", uintFile)).toSet
    assert(conv == Set(
      """{"u32":4294967295,"u64":-1}""",
      """{"u32":7,"u64":-9223372036854775808}""",
      """{"u32":0,"u64":42}"""))
  }

  test("Pq2Json on a uint64 file WITHOUT -r: bare UNSIGNED numbers (converter.rs:296-302)") {
    // round 11 closes the former documented divergence: the footer's
    // INTEGER(64,false) annotation (ParquetMetadata.unsignedInt64Paths)
    // distinguishes raw u64 from a true DECIMAL(20,0), and the renderer
    // emits the reference's bare unsigned JSON number — full u64 range,
    // unquoted, beyond i64.
    val raw = capture(Array(uintFile)).toSet
    assert(raw == Set(
      """{"u32":4294967295,"u64":18446744073709551615}""",
      """{"u32":7,"u64":9223372036854775808}""",
      """{"u32":0,"u64":42}"""))
    // a TRUE decimal(20,0) column (no footer uint annotation) keeps the
    // decimal-string rendering — the verdict must come from the footer,
    // never from the Spark-level type alone
    val dir = java.nio.file.Files.createTempDirectory("dec20-data").toString
    spark.createDataFrame(
      java.util.List.of(Row(java.math.BigDecimal.valueOf(42L).setScale(0))),
      StructType(Seq(StructField("d", DecimalType(20, 0)))))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(capture(Array(dir)).toSet == Set("""{"d":"42"}"""))
    // and the footer walker reports exactly the u64 column
    assert(graft.sources.ParquetMetadata.unsignedInt64Paths(uintFile)
      == Set("u64"))
  }

  test("--cslschema on a real uint file: unsigned ints hit the long/int arms (schema.rs:96,101)") {
    val csl = graft.sources.ParquetMetadata.cslSchema(uintFile)
    assert(csl == Seq(
      graft.sources.ParquetMetadata.CslColumn("u64", "long"),
      graft.sources.ParquetMetadata.CslColumn("u32", "int")))
  }

  test("INT96 timestamps: real legacy file flows through the data path as datetime") {
    val dir = java.nio.file.Files.createTempDirectory("int96-data").toString
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val df = spark.createDataFrame(
        java.util.List.of(
          Row(1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.678Z"))),
          Row(2L, java.sql.Timestamp.from(java.time.Instant.EPOCH))),
        StructType(Seq(StructField("id", LongType, nullable = false),
          StructField("t", TimestampType))))
      df.coalesce(1).write.mode("overwrite").parquet(dir)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val got = capture(Array(dir)).toSet
    assert(got == Set(
      """{"id":1,"t":"2024-01-02T03:04:05.678000Z"}""",
      """{"id":2,"t":"1970-01-01T00:00:00.000000Z"}"""))
    // and the footer maps INT96 -> datetime (schema.rs:103)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    val csl = graft.sources.ParquetMetadata.cslSchema(file)
    assert(csl.find(_.name == "t").map(_.cslType).contains("datetime"))
  }
}
