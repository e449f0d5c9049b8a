package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Off-gate codec probe (builder tool, like [[ScaleProbe]] — not part
  * of the driver contract): writes a harness table under each parquet
  * codec and times write + read-agg, so the BrotliCodec JNI path
  * (round 15) has measured throughput next to the built-in codecs
  * instead of only a correctness spec. Usage:
  * `runMain graft.CodecProbe [sfDir] [table]`. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val table = args.drop(1).headOption.getOrElse("lineitem")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = spark.read.parquet(s"$sfDir/$table.parquet")
      .localCheckpoint() // time the codecs, not the source scan
    val numCol = src.schema.fields
      .find(f => f.dataType.typeName == "long").map(_.name)
      .getOrElse(src.schema.fields.head.name)
    for (codec <- Seq("snappy", "zstd", "gzip", "brotli")) {
      val ok = codec != "brotli" || graft.sources.BrotliNative.writable
      if (!ok) println(s"[codecprobe] codec=$codec SKIP: " +
        graft.sources.BrotliNative.unavailableReason)
      else {
        val out = s"/root/repo/target/codecprobe/$codec"
        val t0 = System.nanoTime()
        src.write.mode("overwrite").option("compression", codec).parquet(out)
        val tw = (System.nanoTime() - t0) / 1e9
        def du(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles).toSeq.flatten.map(du).sum
        val sz = du(new java.io.File(out))
        val t1 = System.nanoTime()
        var rows = 0L
        for (_ <- 1 to 3)
          rows = spark.read.parquet(out)
            .agg(sum(col(numCol)), count(lit(1))).head.getLong(1)
        val tr = (System.nanoTime() - t1) / 1e9 / 3
        println(f"[codecprobe] codec=$codec%s rows=$rows%d bytes=$sz%d " +
          f"write=$tw%.2fs read_avg3=$tr%.2fs")
      }
    }
    spark.stop()
  }
}
