package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The events loader must survive testdata regeneration: the harness has
  * shipped events.ts as parquet TIMESTAMP(NANOS) (rounds 1-6) and as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 7+), and the round-7
  * loader — hard-wired to the nanos vintage — broke 22 queries when the
  * files changed under it. This spec writes BOTH vintages as real parquet
  * files and loads them through [[Tables]], pinning that either one
  * normalizes to the same TimestampType instants.
  */
class TablesFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  @transient var nanosDir: String = _
  @transient var microsDir: String = _

  // one instant, expressed in each vintage's physical unit; the nanos
  // tail (…789) must truncate away to the micros domain on load
  private val micros = 1700000000123456L
  private val nanos  = micros * 1000L + 789L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("tables-fixture-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    nanosDir = java.nio.file.Files.createTempDirectory("events-nanos").toString
    val schema = MessageTypeParser.parseMessageType(
      """message m {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |}""".stripMargin)
    val writer = ExampleParquetWriter.builder(new Path(s"$nanosDir/events.parquet"))
      .withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try {
      writer.write(f.newGroup().append("event_id", 1L).append("ts", nanos))
      writer.write(f.newGroup().append("event_id", 2L).append("ts", 0L))
    } finally writer.close()

    microsDir = java.nio.file.Files.createTempDirectory("events-micros").toString
    // TimestampNTZType writes TIMESTAMP(MICROS, isAdjustedToUTC=false) —
    // byte-identical to the round-7+ harness vintage
    spark.createDataFrame(
      java.util.List.of(
        Row(1L, java.time.LocalDateTime.ofEpochSecond(
          micros / 1000000L, (micros % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)),
        Row(2L, java.time.LocalDateTime.ofEpochSecond(0L, 0, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("event_id", LongType, nullable = false),
        StructField("ts", TimestampNTZType))))
      .coalesce(1).write.mode("overwrite").parquet(s"$microsDir/events.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def instants(dir: String): Map[Long, Long] =
    Tables(spark, dir, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("nanos-long vintage loads to TimestampType micros (legacy flag path)") {
    val df = Tables(spark, nanosDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(instants(nanosDir) == Map(1L -> micros, 2L -> 0L))
  }

  test("micros/NTZ vintage loads to the SAME TimestampType instants") {
    val df = Tables(spark, microsDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(instants(microsDir) == instants(nanosDir))
  }

  test("the live testdata vintage loads — whatever type it carries today") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val df = Tables(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("min(ts)", "max(ts)").collect().head.getTimestamp(0) != null)
  }
}
