package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI shim tests: flag parsing (main.rs:10-124 surface) and the
  * three entry points over real harness parquet. */
class Pq2JsonSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pq2json-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def capture(args: Array[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    Pq2Json.run(spark, Pq2Json.parseArgs(args), ps)
    bos.toString("UTF-8")
  }

  test("arg parsing: prune implies all three omissions; -t sets mode") {
    val a = Pq2Json.parseArgs(Array("-p", "-t", "ticks", "in.parquet"))
    assert(a.opts.omitNulls && a.opts.omitEmptyBags && a.opts.omitEmptyLists)
    assert(a.opts.timestampMode == graft.functions.TimestampMode.Ticks)
    assert(a.input == "in.parquet")
    assertThrows[IllegalArgumentException](Pq2Json.parseArgs(Array("--bogus", "x")))
    assertThrows[IllegalArgumentException](
      Pq2Json.parseArgs(Array("-c", "not-json", "x")))
  }

  test("-d/--distributed: -o becomes a parallel-written part-file directory") {
    val outDir = java.nio.file.Files.createTempDirectory("dist-out").toString + "/out"
    capture(Array("-d", "-o", outDir, s"$dir/nation.parquet"))
    val partLines = new java.io.File(outDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      .sorted.toSeq
    val stdout = capture(Array(s"$dir/nation.parquet"))
      .split("\n").toSeq.filter(_.nonEmpty).sorted
    assert(partLines.length == 25)
    assert(partLines == stdout) // same lines, distributed layout
    assertThrows[IllegalArgumentException](
      Pq2Json.parseArgs(Array("-d", "in.parquet"))) // -d without -o
  }

  test("-t modes flow through the CLI end-to-end (incl. pre-epoch unixms reinterpret)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fixture = java.nio.file.Files.createTempDirectory("ts-modes").toString
    spark.createDataFrame(
      java.util.List.of(
        Row(1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.678Z"))),
        Row(2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(-1L)))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("t", TimestampType))))
      .coalesce(1).write.mode("overwrite").parquet(fixture)
    val iso = capture(Array(fixture)).split("\n")
    assert(iso(0) == """{"id":1,"t":"2024-01-02T03:04:05.678000Z"}""")
    assert(iso(1) == """{"id":2,"t":null}""") // pre-epoch -> chrono-range null
    val ticks = capture(Array("-t", "ticks", fixture)).split("\n")
    val ms = java.time.Instant.parse("2024-01-02T03:04:05.678Z").toEpochMilli
    assert(ticks(0) == s"""{"id":1,"t":${ms * 10000 + 621355968000000000L}}""")
    assert(ticks(1) == """{"id":2,"t":null}""") // u64 overflow -> null
    val unixms = capture(Array("-t", "unixms", fixture)).split("\n")
    assert(unixms(0) == s"""{"id":1,"t":$ms}""")
    // raw micros (-1s) reinterpreted u64 then /1000 (converter.rs:330)
    assert(unixms(1) == """{"id":2,"t":18446744073708551}""")
  }

  test("brotli input: real conversion when the native decoder loads; named ERROR degrade stays pinned") {
    // committed fixture (pyarrow, compression='brotli'): reference reads
    // brotli (Cargo.toml:9). Since r15 we do too when the host carries
    // libbrotlidec (BrotliNative); the decoder-less degrade is pinned
    // through the disable hook so it stays tested on capable hosts.
    val brotli = getClass.getResource("/fixtures/brotli.parquet").getPath
    System.setProperty("graft.brotli.disable", "true")
    try {
      val e = intercept[IllegalArgumentException](capture(Array(brotli)))
      assert(e.getMessage.contains("BROTLI"))
    } finally System.clearProperty("graft.brotli.disable")
    // metadata entry points never touch data pages -> unaffected either way
    val csl = graft.sources.ParquetMetadata.cslSchema(brotli)
    assert(csl.map(c => c.name -> c.cslType) == Seq("a" -> "long", "s" -> "string"))
    assert(graft.sources.ParquetMetadata.rowGroups(brotli).head.numberOfRows == "3")
    assert(graft.sources.ParquetMetadata.codecs(brotli) == Set("BROTLI"))
    // capable-host path: decode is REAL, not a skip — this machine's
    // gate runs it (cancels only on hosts with no lib and no compiler)
    assume(graft.sources.BrotliNative.usable,
      graft.sources.BrotliNative.unavailableReason)
    val out = capture(Array(brotli)).split("\n").toSeq.filter(_.nonEmpty)
    assert(out == Seq("""{"a":1,"s":"x"}""", """{"a":2,"s":"y"}""",
      """{"a":3,"s":"z"}"""))
  }

  test("--rowgroups reports one entry per row group on a multi-group file") {
    // the harness tables are single-row-group; force several tiny groups
    // so the per-group iteration (schema.rs:118-143) is actually exercised
    val dir = java.nio.file.Files.createTempDirectory("multirg").toString
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "16384") // bytes -> many small groups
      .parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    val groups = graft.sources.ParquetMetadata.rowGroups(file)
    assert(groups.length > 1, s"expected multiple row groups, got ${groups.length}")
    assert(groups.map(_.numberOfRows.toLong).sum == 1500L) // all orders rows
    assert(groups.forall(_.totalByteSize.toLong > 0))
  }

  test("brotli pre-check reaches files inside partition subdirectories") {
    val brotli = getClass.getResource("/fixtures/brotli.parquet").getPath
    val root = java.nio.file.Files.createTempDirectory("brotli-part")
    val sub = root.resolve("p=1")
    java.nio.file.Files.createDirectory(sub)
    java.nio.file.Files.copy(java.nio.file.Paths.get(brotli),
      sub.resolve("part-00000.parquet"))
    // marker files must not trip the footer sampling
    java.nio.file.Files.write(root.resolve("_SUCCESS"), Array.empty[Byte])
    System.setProperty("graft.brotli.disable", "true")
    try {
      val e = intercept[IllegalArgumentException](capture(Array(root.toString)))
      assert(e.getMessage.contains("BROTLI"))
    } finally System.clearProperty("graft.brotli.disable")
  }

  test("--columns is a real JSON parse: commas and escapes inside names survive") {
    assert(Pq2Json.parseJsonStringArray("""["a,b","c\"d","A"]""")
      == Seq("a,b", "c\"d", "A"))
    assert(Pq2Json.parseJsonStringArray("[]") == Seq.empty)
    assertThrows[IllegalArgumentException](Pq2Json.parseJsonStringArray("[1,2]"))
    assertThrows[IllegalArgumentException](Pq2Json.parseJsonStringArray("""{"a":1}"""))
  }

  test("JSONL conversion: one sorted-key object per row") {
    val out = capture(Array(s"$dir/region.parquet")).split("\n")
    assert(out.length == 5)
    assert(out(0).startsWith("{\"r_name\":"))
    assert(out.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("CSV conversion with projection and missing column") {
    val out = capture(Array("--csv", "-c", """["r_regionkey","nope","r_name"]""",
      s"$dir/region.parquet")).split("\n")
    assert(out.length == 5)
    // missing col renders as an empty slot in requested position; \r ends
    // the record (completed to \r\n by the line writer)
    assert(out(0).matches("\\d+,,[A-Z ]+\r"))
  }

  test("cslschema and rowgroups entry points emit reference-shaped JSON") {
    val csl = capture(Array("--cslschema", s"$dir/lineitem.parquet"))
    assert(csl.trim.startsWith("""[{"name":"l_orderkey","type":"long"}"""))
    val rg = capture(Array("--rowgroups", s"$dir/lineitem.parquet"))
    assert(rg.trim.matches("""\[\{"numberOfRows":"\d+","totalByteSize":"\d+"\}.*"""))
  }

  test("schema entry point dumps the parquet schema") {
    val s = capture(Array("--schema", s"$dir/region.parquet"))
    assert(s.contains("r_regionkey") && s.contains("Parquet metadata"))
  }

  test("u64 footer-disagreement warnings: absent path is NOT a conflict; one line per path names the signed files") {
    // ADVICE r12: the old check treated "file lacks the column path"
    // the same as "path present but signed", and printed one line per
    // (path, file) pair. Pinned here on the pure function.
    def f(name: String, u64: Set[String], all: Set[String]) = (name, u64, all)
    // partial-schema dump: fileB simply lacks 'k' — no conflict
    assert(Pq2Json.u64FooterWarnings(Seq(
      f("a.parquet", Set("k"), Set("k", "x")),
      f("b.parquet", Set(), Set("x")))).isEmpty)
    // real disagreement: ONE aggregated line naming both signed files
    val w = Pq2Json.u64FooterWarnings(Seq(
      f("a.parquet", Set("k"), Set("k")),
      f("b.parquet", Set(), Set("k")),
      f("c.parquet", Set(), Set("k"))))
    assert(w.size == 1, w)
    assert(w.head.contains("'k'") && w.head.contains("b.parquet, c.parquet"), w)
    // two conflicted paths -> two lines, sorted by path, never per-file
    val w2 = Pq2Json.u64FooterWarnings(Seq(
      f("a.parquet", Set("k1", "k2"), Set("k1", "k2")),
      f("b.parquet", Set(), Set("k1", "k2"))))
    assert(w2.size == 2 && w2(0).contains("'k1'") && w2(1).contains("'k2'"), w2)
    // agreement (both unsigned): silent
    assert(Pq2Json.u64FooterWarnings(Seq(
      f("a.parquet", Set("k"), Set("k")),
      f("b.parquet", Set("k"), Set("k")))).isEmpty)
  }
}
