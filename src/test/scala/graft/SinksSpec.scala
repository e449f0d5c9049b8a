package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sink surface beyond the reference's JSONL/CSV text output (SURVEY §2.2):
  * parquet/orc/json/csv writers round-trip the engine's outputs, and the
  * Kusto writers produce the reference's exact line formats on disk.
  */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sinks-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("out").toString

  test("parquet/orc/json/csv sinks round-trip a query result") {
    val df = SparkEntry.queries("q01_agg_pricing")(spark, dir)
    val want = df.collect().map(_.toString).sorted.toSeq
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = tmp(s"sink-$fmt")
      val w = df.write.mode("overwrite")
      (if (fmt == "csv" || fmt == "json") w.option("header", "true") else w)
        .format(fmt).save(path)
      val r = spark.read.option("header", "true").option("inferSchema", "true")
        .format(fmt).load(path)
      assert(r.count() == want.length, fmt)
    }
  }

  test("kusto JSONL writer: one JSON object per line on disk") {
    val path = tmp("kjson")
    graft.functions.KustoRender.writeKustoJson(
      Tables(spark, dir, "region"), path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    assert(lines.length == 5)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("kusto CSV writer: \\r\\n records on disk (reference terminator)") {
    val path = tmp("kcsv")
    graft.functions.KustoRender.writeKustoCsv(
      Tables(spark, dir, "region"), path)
    // read raw bytes: every record must end \r\n
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    val content = files.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).mkString
    val records = content.split("\n").filter(_.nonEmpty)
    assert(records.length == 5)
    assert(records.forall(_.endsWith("\r")), records.head)
  }

  test("multi-file datasets read as one table (beyond the reference's single file)") {
    val path = tmp("multi")
    val r = Tables(spark, dir, "region")
    r.repartition(3).write.mode("overwrite").parquet(path) // 3 part files
    val back = spark.read.parquet(path)
    assert(back.count() == 5)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("part-")) == 3)
  }
}
