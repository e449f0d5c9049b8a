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
}
