package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BrotliNative

/** The native brotli path (round-15 close of the long-standing #1
  * missing item): libbrotlidec bound through a compile-at-first-use JNI
  * shim, surfaced to parquet as the org.apache.hadoop.io.compress
  * .BrotliCodec parquet-java resolves by name. The reference reads
  * brotli out of the box (`/root/reference/pq2json/Cargo.toml:9`);
  * these tests prove we now match it — really decoding, not skipping —
  * on any host with the shared library and a C compiler, and degrade
  * by the documented named ERROR elsewhere (Pq2JsonSpec pins that leg
  * via the disable hook). */
class BrotliSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("brotli-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def assumeUsable(): Unit =
    assume(BrotliNative.usable, BrotliNative.unavailableReason)

  test("native round-trip: compress then decompress restores the bytes") {
    assumeUsable()
    assume(BrotliNative.writable, "no libbrotlienc on this host")
    val payload = (0 until 50000)
      .map(i => s"row-$i:${"x" * (i % 17)}").mkString("\n")
      .getBytes("UTF-8")
    val packed = BrotliNative.compress(payload, 5, 22)
    assert(packed.length < payload.length / 2, // text must actually shrink
      s"compressed ${packed.length} of ${payload.length}")
    assert(BrotliNative.decompress(packed, -1L).toSeq == payload.toSeq)
    // a correct size hint and a too-small hint must agree (the grow path)
    assert(BrotliNative.decompress(packed, payload.length.toLong).toSeq
      == payload.toSeq)
    assert(BrotliNative.decompress(packed, 16L).toSeq == payload.toSeq)
  }

  test("corrupt and truncated streams raise IOException, never garbage") {
    assumeUsable()
    assume(BrotliNative.writable, "no libbrotlienc on this host")
    val packed = BrotliNative.compress("hello brotli world".getBytes, 5, 22)
    intercept[java.io.IOException](
      BrotliNative.decompress(packed.take(packed.length - 3), -1L))
    intercept[java.io.IOException](
      BrotliNative.decompress(Array.fill[Byte](64)(0x7f), -1L))
  }

  test("Spark reads the committed pyarrow brotli fixture") {
    assumeUsable()
    val brotli = getClass.getResource("/fixtures/brotli.parquet").getPath
    val rows = spark.read.parquet(brotli)
      .orderBy("a").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("Spark writes brotli parquet; footer says BROTLI; Spark and pq2json read it back") {
    assumeUsable()
    assume(BrotliNative.writable, "no libbrotlienc on this host")
    val out = java.nio.file.Files.createTempDirectory("brotli-rt").toString
    Tables(spark, "/root/testdata/sf0.001", "nation")
      .coalesce(1).write.mode("overwrite")
      .option("compression", "brotli").parquet(out)
    val file = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    assert(graft.sources.ParquetMetadata.codecs(file) == Set("BROTLI"))
    val back = spark.read.parquet(out)
    assert(back.count() == 25L)
    assert(back.selectExpr("sum(n_nationkey)").head.getLong(0) == 300L)
    // the CLI path decodes it too (pre-check passes on a usable host)
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    Pq2Json.run(spark, Pq2Json.parseArgs(Array(out)), ps)
    assert(bos.toString("UTF-8").split("\n").count(_.nonEmpty) == 25)
  }

  test("multi-page brotli file: every page decodes (per-page one-shot unit)") {
    assumeUsable()
    assume(BrotliNative.writable, "no libbrotlienc on this host")
    val out = java.nio.file.Files.createTempDirectory("brotli-pages").toString
    // tiny pages + tiny row groups force many independent brotli streams
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .coalesce(1).write.mode("overwrite")
      .option("compression", "brotli")
      .option("parquet.page.size", "2048")
      .option("parquet.block.size", "16384")
      .parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 1500L)
    val expect = Tables(spark, "/root/testdata/sf0.001", "orders")
      .selectExpr("sum(o_orderkey)").head.getLong(0)
    assert(back.selectExpr("sum(o_orderkey)").head.getLong(0) == expect)
  }
}
