package graft.sources

import java.io.IOException
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** JNI carrier for the system brotli library; the native methods are
  * implemented by `src/main/resources/native/graft_brotli.c`, compiled
  * at first use by [[BrotliNative]]. Instance (not object) methods so
  * the JNI symbol names stay free of Scala's `$` mangling. */
private[graft] class BrotliJni {
  @native def decompress(input: Array[Byte], sizeHint: Long): Array[Byte]
  @native def compress(input: Array[Byte], quality: Int, lgwin: Int): Array[Byte]
}

/** Runtime bridge to the machine's brotli shared libraries.
  *
  * The reference reads brotli-compressed parquet out of the box
  * (`/root/reference/pq2json/Cargo.toml:9` — the Rust parquet crate
  * bundles a decoder), but no JVM brotli decoder artifact resolves in
  * this offline environment (netty's `BrotliDecoder` needs absent
  * brotli4j natives; hadoop's shaded commons-compress wrapper needs the
  * absent `org.brotli:dec`). What DOES exist on a stock Linux host is
  * the C library itself — `libbrotlidec.so` ships with curl, Chrome,
  * conda, most distros — so this object closes the gap from first
  * principles: it discovers the shared library, compiles the ~140-line
  * JNI shim bundled in our resources with the system C compiler, and
  * `System.load`s the result. Everything is lazy and failure-tolerant:
  * on a host with no compiler or no library, [[usable]] is false and
  * every caller degrades to the same named-`ERROR:` fail-fast this repo
  * shipped while the environment had no decoder at all.
  *
  * Scale note: the compile happens once per JVM (not per task), only on
  * first brotli touch, and costs ~100 ms; decompression itself is the
  * same native code parquet-cpp ships, called per page buffer with the
  * page's known uncompressed size as the allocation hint.
  */
object BrotliNative { // public: the hadoop-package BrotliCodec shim calls in

  /** Test hook: `-Dgraft.brotli.disable=true` forces the unavailable
    * path so the named-error degrade stays spec-pinned even on hosts
    * where the real decoder loads. Read per call, not cached. */
  private def disabled: Boolean =
    sys.props.get("graft.brotli.disable").contains("true")

  /** Directories probed for `libbrotlidec.so*` / `libbrotlienc.so*`,
    * most specific first. `GRAFT_BROTLI_LIB` overrides; the conda
    * locations cover Anaconda/Miniconda hosts (this machine's decoder
    * lives in the miniconda tree); the rest are the standard Linux
    * multiarch locations. */
  private def probeDirs: Seq[Path] =
    (sys.env.get("GRAFT_BROTLI_LIB").toSeq ++
      sys.env.get("CONDA_PREFIX").map(_ + "/lib").toSeq ++
      Seq("/root/miniconda/lib", "/usr/lib/x86_64-linux-gnu",
        "/usr/lib/aarch64-linux-gnu", "/usr/lib64", "/usr/lib",
        "/usr/local/lib")).map(Paths.get(_)).filter(Files.isDirectory(_))

  /** Newest-name match for `lib<base>.so` (preferred) or a versioned
    * `lib<base>.so.N...` in the probe dirs. */
  private def findLib(base: String): Option[Path] = {
    val exact = s"lib$base.so"
    probeDirs.iterator.flatMap { d =>
      val direct = d.resolve(exact)
      if (Files.exists(direct)) Some(direct)
      else {
        val versioned = Option(d.toFile.listFiles()).toSeq.flatten
          .filter(f => f.isFile && f.getName.startsWith(exact + "."))
          .sortBy(_.getName).lastOption
        versioned.map(_.toPath)
      }
    }.nextOption()
  }

  private def findCompiler: Option[String] =
    Seq("gcc", "cc", "clang").find { c =>
      scala.util.Try {
        val p = new ProcessBuilder(c, "--version")
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        p.waitFor() == 0
      }.getOrElse(false)
    }

  /** One-time (per JVM) discover + compile + load. Left = the reason
    * brotli is unavailable, surfaced verbatim in the fail-fast error. */
  private lazy val loaded: Either[String, (BrotliJni, Boolean)] =
    try {
      val dec = findLib("brotlidec")
      val enc = findLib("brotlienc") // optional: decoder-only hosts read but not write
      (dec, findCompiler) match {
        case (None, _) =>
          Left("no libbrotlidec.so found (probed " +
            probeDirs.mkString(", ") + "; set GRAFT_BROTLI_LIB)")
        case (_, None) =>
          Left("no C compiler (gcc/cc/clang) available to build the JNI shim")
        case (Some(decLib), Some(cc)) =>
          val tmp = Files.createTempDirectory("graft-brotli-native")
          tmp.toFile.deleteOnExit()
          val src = tmp.resolve("graft_brotli.c")
          val in = getClass.getResourceAsStream("/native/graft_brotli.c")
          require(in != null, "bundled native/graft_brotli.c resource missing")
          try Files.copy(in, src, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          val out = tmp.resolve("libgraftbrotli.so")
          val javaHome = System.getProperty("java.home")
          val rpaths = (decLib +: enc.toSeq).map(_.getParent).distinct
            .flatMap(d => Seq("-Wl,-rpath," + d))
          val cmd = Seq(cc, "-shared", "-fPIC", "-O2",
            s"-I$javaHome/include", s"-I$javaHome/include/linux",
            src.toString, "-o", out.toString) ++
            (if (enc.isEmpty) Seq("-DGRAFT_BROTLI_NO_ENC") else Seq.empty) ++
            (decLib +: enc.toSeq).map(_.toString) ++ rpaths
          val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
          val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
          if (p.waitFor() != 0)
            Left(s"JNI shim compile failed: ${log.take(500)}")
          else {
            System.load(out.toString)
            Right((new BrotliJni, enc.isDefined))
          }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** True when brotli parquet can be READ on this host. */
  def usable: Boolean = !disabled && loaded.isRight

  /** True when brotli parquet can also be WRITTEN (encoder lib found). */
  def writable: Boolean = !disabled && loaded.exists(_._2)

  def unavailableReason: String =
    if (disabled) "disabled via -Dgraft.brotli.disable"
    else loaded.left.getOrElse("available")

  def decompress(input: Array[Byte], sizeHint: Long): Array[Byte] = {
    if (disabled) throw new IOException(
      s"brotli native decoder unavailable: $unavailableReason")
    val jni = loaded.getOrElse(throw new IOException(
      s"brotli native decoder unavailable: $unavailableReason"))._1
    val out = jni.decompress(input, sizeHint)
    if (out == null)
      throw new IOException("brotli decompress failed: corrupt or " +
        s"truncated stream (${input.length} input bytes)")
    out
  }

  def compress(input: Array[Byte], quality: Int, lgwin: Int): Array[Byte] = {
    if (disabled) throw new IOException(
      s"brotli native encoder unavailable: $unavailableReason")
    val st = loaded.getOrElse(throw new IOException(
      s"brotli native encoder unavailable: $unavailableReason"))
    if (!st._2) throw new IOException(
      "brotli native encoder unavailable: libbrotlienc.so not found")
    val out = st._1.compress(input, quality, lgwin)
    if (out == null)
      throw new IOException(
        s"brotli compress failed (${input.length} input bytes)")
    out
  }
}
