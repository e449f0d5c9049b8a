package graft

import graft.functions.{KustoRender, KustoRenderOptions, TimestampMode}
import graft.sources.ParquetMetadata
import org.apache.spark.sql.SparkSession

/** CLI shim reproducing the reference's entry surface 1:1
  * (`/root/reference/pq2json/src/main.rs:10-157`) over SparkSession — the
  * acceptance surface for diff-testing against the reference binary.
  *
  *   pq2json [--csv] [-c/--columns JSON_ARRAY] [-o/--output FILE]
  *           [--omit-nulls] [--omit-empty-bags] [--omit-empty-lists]
  *           [-p/--prune] [-r/--convert-types] [-t/--timestamp MODE]
  *           [--schema | --cslschema | --rowgroups] INPUT
  *
  * Faithfulness notes:
  *   - `-o` actually works here; in the reference it is dead code
  *     (`main.rs:127` queries `value_of("OUT_FILE")` but the arg is named
  *     "output", so output always goes to stdout).
  *   - errors print `ERROR: ...` on stderr and exit nonzero
  *     (`main.rs:159-165`).
  *   - conversion streams through `toLocalIterator`, so driver memory is
  *     O(partition) — the Spark analogue of the reference's O(row)
  *     streaming loop (`converter.rs:133`). Row order is scan order, which
  *     for a single parquet file matches the reference's file order.
  */
object Pq2Json {

  final case class Args(
      input: String = null, output: Option[String] = None,
      columns: Option[Seq[String]] = None, csv: Boolean = false,
      schema: Boolean = false, cslSchema: Boolean = false,
      rowGroups: Boolean = false, distributed: Boolean = false,
      opts: KustoRenderOptions = KustoRenderOptions())

  def parseArgs(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    var omitNulls, omitBags, omitLists, prune = false
    while (i < argv.length) {
      argv(i) match {
        case "--omit-nulls" => omitNulls = true
        case "--omit-empty-bags" => omitBags = true
        case "--omit-empty-lists" => omitLists = true
        case "-p" | "--prune" => prune = true
        case "-r" | "--convert-types" =>
          a = a.copy(opts = a.opts.copy(convertTypes = true))
        case "--csv" => a = a.copy(csv = true)
        case "--schema" => a = a.copy(schema = true)
        case "--cslschema" => a = a.copy(cslSchema = true)
        case "--rowgroups" => a = a.copy(rowGroups = true)
        case "-t" | "--timestamp" =>
          i += 1
          a = a.copy(opts = a.opts.copy(timestampMode = TimestampMode.parse(argv(i))))
        case "-c" | "--columns" =>
          i += 1
          a = a.copy(columns = Some(parseJsonStringArray(argv(i))))
        case "-o" | "--output" =>
          i += 1
          a = a.copy(output = Some(argv(i)))
        case "-d" | "--distributed" => a = a.copy(distributed = true)
        case v if v.startsWith("-v") => // verbosity: accepted, unused
        case other if a.input == null => a = a.copy(input = other)
        case other => throw new IllegalArgumentException(s"unexpected argument: $other")
      }
      i += 1
    }
    require(a.input != null, "INPUT must be provided")
    require(!a.distributed || a.output.isDefined, "--distributed requires -o OUT_DIR")
    a = a.copy(opts = a.opts.copy(
      omitNulls = omitNulls || prune,
      omitEmptyBags = omitBags || prune,
      omitEmptyLists = omitLists || prune))
    a
  }

  /** `--columns` takes a JSON array of strings (`main.rs:142-145`). Parsed
    * with Jackson (already on the Spark classpath) like the reference's
    * serde_json parse, so names containing commas or escaped quotes work. */
  def parseJsonStringArray(s: String): Seq[String] = {
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(
            s"expected a JSON array of column names: ${e.getMessage}")
      }
    require(node != null && node.isArray, "expected a JSON array of column names")
    val out = Seq.newBuilder[String]
    node.forEach { e =>
      require(e.isTextual, "expected a JSON array of double-quoted column names")
      out += e.asText()
    }
    out.result()
  }

  private def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder
    graft.functions.KValue.escapeInto(sb, s)
    sb.toString
  }

  /** The u64 footer-disagreement warnings over the sampled footers —
    * `(file, u64Paths, allPrimitivePaths)` per sampled file. The render
    * verdict is a single column-path set applied to the WHOLE directory;
    * a dump mixing files where the same path is UINT64 in one and plain
    * INT64/true decimal in another would render ALL rows unsigned.
    * Homogeneous dumps (one writer config) are the contract — but footer
    * DISAGREEMENT is observable for free here, so warn instead of
    * silently unioning (ADVICE r11). Only files whose footer actually
    * CONTAINS the path count as disagreeing (a partial-schema dump is
    * not a signedness conflict), and warnings aggregate to ONE line per
    * path naming the disagreeing files — never a line per (path, file)
    * pair (ADVICE r12). Factored pure for Pq2JsonSpec. */
  private[graft] def u64FooterWarnings(
      sampled: Seq[(String, Set[String], Set[String])]): Seq[String] = {
    val u64Paths = sampled.flatMap(_._2).toSet
    u64Paths.toSeq.sorted.flatMap { path =>
      val signedIn = sampled.collect {
        case (file, u64, all) if all.contains(path) && !u64.contains(path) => file
      }
      if (signedIn.isEmpty) None
      else Some(s"WARNING: column path '$path' is UINT64 in some sampled " +
        s"footers but signed in ${signedIn.mkString(", ")}; rendering it " +
        "unsigned for ALL rows — re-encode the dump with one writer config")
    }
  }

  def run(spark: SparkSession, a: Args, out: java.io.PrintStream): Unit = {
    if (a.schema) {
      out.println("\n\nParquet metadata")
      out.println("=================================================")
      out.println(ParquetMetadata.schemaString(a.input))
    } else if (a.cslSchema) {
      out.println(ParquetMetadata.cslSchema(a.input)
        .map(c => s"""{"name":${jsonEscape(c.name)},"type":"${c.cslType}"}""")
        .mkString("[", ",", "]"))
    } else if (a.rowGroups) {
      out.println(ParquetMetadata.rowGroups(a.input)
        .map(r => s"""{"numberOfRows":"${r.numberOfRows}","totalByteSize":"${r.totalByteSize}"}""")
        .mkString("[", ",", "]"))
    } else {
      // Brotli inputs: the reference reads brotli (Cargo.toml:9). When
      // the native decoder is loadable we now do too (see the gate
      // below); otherwise fail fast with a message that names the codec
      // instead of surfacing a mid-scan error from the codec lookup.
      // Footer-only ops (--schema/--cslschema/--rowgroups) stay available.
      // Local paths only — remote filesystems skip the pre-check and get
      // Spark's own error.
      // One sampled data file per directory level, recursing into
      // partition subdirectories: a partitioned dataset is written by one
      // writer config, so its files share a codec, and sampling bounds the
      // driver-side footer reads to O(directories) instead of O(files).
      // *.parquet-named files are sampled FIRST so a stray non-parquet
      // file cannot mask a brotli data file behind it; depth is capped so
      // a symlink cycle cannot recurse forever. Unreadable footers are
      // skipped — the scan itself will produce its own error for those.
      def sampleFiles(f: java.io.File, depth: Int = 0): Seq[String] =
        if (f.isFile) Seq(f.getPath)
        else if (f.isDirectory && depth < 32) {
          // listFiles() is null for unreadable dirs, not empty
          val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          val data = kids.filter(k => k.isFile && k.length > 0 &&
            !k.getName.startsWith("_") && !k.getName.startsWith("."))
          val (pq, other) = data.partition(_.getName.endsWith(".parquet"))
          val sample = pq.sortBy(_.getName).headOption
            .orElse(other.sortBy(_.getName).headOption)
          sample.map(_.getPath).toSeq ++
            kids.filter(_.isDirectory).sortBy(_.getName)
              .flatMap(sampleFiles(_, depth + 1))
        } else Seq.empty
      // When the host provides libbrotlidec (+ a C compiler for the JNI
      // shim), graft.sources.BrotliNative backs the
      // org.apache.hadoop.io.compress.BrotliCodec we ship under the
      // name parquet-java resolves, and brotli inputs convert like any
      // other codec — matching the reference, which reads brotli out of
      // the box. The fail-fast below is the degrade for hosts where the
      // native decoder cannot load.
      if (!graft.sources.BrotliNative.usable)
        sampleFiles(new java.io.File(a.input)).find { p =>
          scala.util.Try(ParquetMetadata.codecs(p).contains("BROTLI")).getOrElse(false)
        }.foreach { p =>
          throw new IllegalArgumentException(
            s"unsupported compression codec BROTLI in $p: no brotli parquet " +
              "codec is available to Spark on this host (" +
              graft.sources.BrotliNative.unavailableReason + "; the " +
              "reference reads brotli via the Rust parquet crate); " +
              "re-encode with snappy/zstd/gzip")
        }
      // footer verdict on raw-u64 columns: Spark's schema shows them as
      // Decimal(20,0) (indistinguishable from a true decimal), but the
      // reference renders raw u64 as a bare unsigned JSON number
      // (`converter.rs:296-302`) — the sampled footers carry the
      // distinction into the render options. Unreadable footers are
      // skipped like the codec pre-check.
      val u64Sampled = sampleFiles(new java.io.File(a.input)).flatMap { p =>
        scala.util.Try((ParquetMetadata.unsignedInt64Paths(p),
          ParquetMetadata.primitivePaths(p))).toOption
          .map { case (u64, all) => (p, u64, all) }
      }
      val u64Paths = u64Sampled.flatMap(_._2).toSet
      u64FooterWarnings(u64Sampled).foreach(System.err.println)
      val opts = a.opts.copy(unsignedPaths = u64Paths)
      val df = spark.read.parquet(a.input)
      val rendered =
        if (a.csv) KustoRender.toKustoCsv(df, a.columns, opts)
        else {
          // JSON path ignores requested-but-missing columns
          // (`converter.rs:81-84` only CSV emits null slots).
          val projected = a.columns match {
            case Some(cols) =>
              val present = df.columns.toSet
              df.select(cols.filter(present.contains).map(df.col): _*)
            case None => df
          }
          KustoRender.toKustoJson(projected, opts)
        }
      // CSV lines already end in \r, so "\n" completes the reference's
      // \r\n record terminator; JSON lines get plain \n (writeln!).
      if (a.distributed) {
        // -d/--distributed: OUT is a DIRECTORY of part files written in
        // parallel by every executor — the 100 TB path. The reference's
        // single-ordered-file contract can't parallel-write (one writer,
        // one order), so the streaming-through-the-driver default stays
        // faithful and -d is the scale escape hatch; within each part
        // file, line order is scan order.
        rendered.write.mode("overwrite").text(a.output.get) // parseArgs requires -o
      } else {
        val it = rendered.toLocalIterator()
        while (it.hasNext) { out.print(it.next().getString(0)); out.print("\n") }
      }
    }
  }

  def main(argv: Array[String]): Unit = {
    try {
      val a = parseArgs(argv)
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("pq2json")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        // distributed mode writes the directory itself — don't open (and
        // truncate) the output path as a local file here
        val localOut = a.output.filterNot(_ => a.distributed)
        val out = localOut match {
          case Some(f) => new java.io.PrintStream(new java.io.FileOutputStream(f), false, "UTF-8")
          case None => System.out
        }
        run(spark, a, out)
        out.flush()
        if (localOut.isDefined) out.close()
      } finally spark.stop()
    } catch {
      case e: Throwable =>
        System.err.println(s"ERROR: ${e.getMessage}")
        sys.exit(255) // the reference exits -1 (main.rs:163)
    }
  }
}
