/* This class deliberately lives in org.apache.hadoop.io.compress:
 * parquet-java's CompressionCodecName enum hard-codes BROTLI ->
 * "org.apache.hadoop.io.compress.BrotliCodec" (see parquet-hadoop
 * 1.16.0, CompressionCodecName), and both Spark's vectorized parquet
 * reader and the parquet writer resolve that name reflectively via the
 * Hadoop Configuration classloader. Shipping the class under the
 * expected name in OUR jar is the standard extension mechanism — no
 * Hadoop internals are touched, only the public CompressionCodec SPI
 * is implemented. The actual bit-twiddling is delegated to
 * graft.sources.BrotliNative (system libbrotli via a JNI shim).
 */
package org.apache.hadoop.io.compress

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream,
  OutputStream}

import graft.sources.BrotliNative

/** Hadoop CompressionCodec for parquet BROTLI column chunks.
  *
  * Parquet compresses each page independently and frames it with the
  * page header's compressed/uncompressed sizes, so the codec streams
  * see exactly one raw brotli stream per use and whole-buffer one-shot
  * (de)compression is the natural unit: `createInputStream` slurps the
  * page buffer (already heap-resident in parquet's read path) and
  * inflates once; `createOutputStream` buffers the page and deflates on
  * `finish()`. The Compressor/Decompressor objects exist only to
  * satisfy the CodecPool lifecycle parquet's CodecFactory drives —
  * parquet never pushes bytes through them directly, always through the
  * codec streams.
  *
  * Scale: pages are bounded (~1 MiB default) so the per-page heap copy
  * is constant-size; the native call is once per page, not per value.
  */
class BrotliCodec extends CompressionCodec {
  import BrotliCodec._

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new BrotliOutputStream(out)

  override def createOutputStream(out: OutputStream,
      c: Compressor): CompressionOutputStream = new BrotliOutputStream(out)

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[PooledNoopCompressor]

  override def createCompressor(): Compressor = new PooledNoopCompressor

  override def createInputStream(in: InputStream): CompressionInputStream =
    new BrotliInputStream(in)

  override def createInputStream(in: InputStream,
      d: Decompressor): CompressionInputStream = new BrotliInputStream(in)

  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[PooledNoopDecompressor]

  override def createDecompressor(): Decompressor = new PooledNoopDecompressor

  override def getDefaultExtension: String = ".br"
}

object BrotliCodec {

  /** Encoder parameters for the write path. Quality 5 is the
    * speed/ratio knee the brotli authors recommend for on-the-fly use;
    * lgwin 22 (4 MiB window) always covers a parquet page. */
  private val Quality = 5
  private val LgWin = 22

  private final class BrotliInputStream(wrapped: InputStream)
      extends CompressionInputStream(wrapped) {
    private var buf: ByteArrayInputStream = null

    private def ensure(): ByteArrayInputStream = {
      if (buf == null)
        buf = new ByteArrayInputStream(
          BrotliNative.decompress(in.readAllBytes(), -1L))
      buf
    }

    override def read(): Int = ensure().read()

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ensure().read(b, off, len)

    override def available(): Int = ensure().available()

    override def resetState(): Unit = { buf = null }
  }

  private final class BrotliOutputStream(wrapped: OutputStream)
      extends CompressionOutputStream(wrapped) {
    private val buf = new ByteArrayOutputStream()
    private var finished = false

    override def write(b: Int): Unit = {
      require(!finished, "write after finish")
      buf.write(b)
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      require(!finished, "write after finish")
      buf.write(b, off, len)
    }

    override def finish(): Unit = if (!finished) {
      finished = true
      out.write(BrotliNative.compress(buf.toByteArray, Quality, LgWin))
    }

    override def resetState(): Unit = { buf.reset(); finished = false }
  }

  /** CodecPool lifecycle stubs: parquet borrows/returns these around
    * every page but moves the bytes through the codec streams above, so
    * the only contract that matters is that reset()/end() are safe and
    * the objects are stateless (the pool shares them across threads'
    * checkouts over time). Any direct byte-pushing use would be a
    * misuse — fail loudly instead of corrupting data. */
  private final class PooledNoopDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit =
      throw new UnsupportedOperationException(
        "BrotliCodec decompresses via its CompressionInputStream only")
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
      throw new UnsupportedOperationException("no preset dictionary")
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = false
    override def decompress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException(
        "BrotliCodec decompresses via its CompressionInputStream only")
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  private final class PooledNoopCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit =
      throw new UnsupportedOperationException(
        "BrotliCodec compresses via its CompressionOutputStream only")
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
      throw new UnsupportedOperationException("no preset dictionary")
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = false
    override def compress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException(
        "BrotliCodec compresses via its CompressionOutputStream only")
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
  }
}
