package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column plumbing: treat media (image/audio/video) as opaque
  * `binary` columns and run the decode / feature-extraction step as a
  * per-partition batch job — the Scala analogue of a `mapInPandas` decode
  * stage. The actual codec libraries are absent from this environment by
  * design, so `decode` is a clearly-marked deterministic stub; everything
  * around it — schema, the Dataset[(id, bytes)] batch shape, partition-wise
  * execution, downstream column contract — is the real pipeline a decoder
  * would drop into.
  *
  * At 100 TB the decode stage is a narrow per-partition pass: no shuffle,
  * parallelism = input splits, and partition size is controlled by
  * `spark.sql.files.maxPartitionBytes` so a batch of blobs fits executor
  * memory alongside the decoder's working set.
  */
object MultimodalStub {

  /** Fake "decoded media" metadata; deterministic pure function of bytes. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, head_bytes: String,
      fake_width: Long, fake_channels: Int)

  /** STUB standing in for a real image decode (???): derives metadata from
    * the raw bytes only. A real implementation would decode `bytes` here
    * (per-partition, batched) and emit true width/height/channels. */
  private def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val head = bytes.take(8).map(b => (b & 0xff).toString).mkString(",")
    MediaFeatures(id, bytes.length.toLong, head, bytes.length.toLong % 640, 3)
  }

  /** df(doc_id: long, blob: binary) -> per-partition batch "decode". */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df.as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      // One iterator pass per partition: the decoder (or its native
      // context) initializes once here, then streams the batch.
      it.map { case (id, bytes) => decode(id, bytes) }
    }.toDF()
  }

  /** Container metadata extracted by REAL header parsing (no codec libs
    * needed — these are byte-layout reads of the container formats, the
    * part of "decode" that never required a native library):
    *
    *   - PNG: width/height from the IHDR chunk (big-endian u32 at offsets
    *     16/20 after the 8-byte signature), channels from the color type
    *   - JPEG: baseline/progressive SOF segment walk (skip APPn/DQT/...
    *     by their big-endian lengths until a C0-CF frame marker, excluding
    *     C4/C8/CC), height/width/components from the frame header
    *   - WAV: RIFF/WAVE fmt fields, little-endian (channels, sample rate)
    *
    * Only pixel/sample decoding remains stubbed in [[extractFeatures]].
    */
  final case class MediaProbe(
      doc_id: Long, format: String, width: Int, height: Int, channels: Int,
      n_bytes: Long)

  def probe(id: Long, b: Array[Byte]): MediaProbe = {
    def u8(i: Int): Int = b(i) & 0xff
    def u16be(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32be(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (b.length >= 26 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      val channels = u8(25) match { // PNG color type -> sample channels
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0
      }
      MediaProbe(id, "png", u32be(16), u32be(20), channels, b.length.toLong)
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out: MediaProbe = MediaProbe(id, "jpeg", 0, 0, 0, b.length.toLong)
      var done = false
      while (!done && i + 9 < b.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          out = MediaProbe(id, "jpeg", u16be(i + 7), u16be(i + 5), u8(i + 9),
            b.length.toLong)
          done = true
        } else i += 2 + u16be(i + 2) // segment length includes its own bytes
      }
      out
    } else if (b.length >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // "width" carries the sample rate for audio; height is meaningless
      MediaProbe(id, "wav", u32le(24), 0, u16le(22), b.length.toLong)
    } else MediaProbe(id, "unknown", 0, 0, 0, b.length.toLong)
  }

  /** df(doc_id: long, blob: binary) -> real container metadata, same
    * per-partition batch shape as [[extractFeatures]]. */
  def probeMedia(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => probe(id, bytes) })
      .toDF()
  }
}
