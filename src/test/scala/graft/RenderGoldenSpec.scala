package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Golden hashes of the full Kusto JSONL render of every harness table at
  * sf0.001 — the cross-round regression net for the renderer: ANY change
  * to float text, timestamp formatting, key ordering, escaping, or null
  * semantics moves a hash. If a change here is intentional, recompute with
  * the commented one-liner and update.
  */
class RenderGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("render-golden-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // md5 over sorted "line\n" bytes; recompute via
  //   KustoRender.toKustoJson(Tables(spark, dir, t)).collect().map(_.getString(0)).sorted
  private val golden = Map(
    "region" -> "3dbd7e881c19d174bd99a136403c5acd", // 5 rows
    "nation" -> "aae1a792715223e736a0069060f3614b", // 25 rows
    "customer" -> "b8e8f75cb6354ed7145ef5a6db0c49bd", // 150 rows
    "supplier" -> "2a994f14b03159b80732b901890adb7d", // 10 rows
    "part" -> "56417733a5309f0c4de0405895d2b3e7", // 200 rows
    "orders" -> "3d1c656fb6aa97b40419e2264f164c44", // 1500 rows
    "lineitem" -> "effa83d467b79dd28bfa27dd983ef401", // 6000 rows
    "events" -> "ae884fd26972acbbc9c2674d5ba86a13", // 1000 rows
    "documents" -> "a905651d338f2d5b92f52b3e500300da", // 500 rows
    "embeddings" -> "559d60e35e83ea19f359b625b6ee52f8" // 500 rows
  )

  test("kusto JSONL render of every harness table matches its golden hash") {
    for (t <- Tables.names) {
      val lines = graft.functions.KustoRender.toKustoJson(Tables(spark, dir, t))
        .collect().map(_.getString(0)).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
      val hash = md.digest().map("%02x".format(_)).mkString
      assert(hash == golden(t), s"table $t: got $hash (first line: ${lines.head})")
    }
  }
}
