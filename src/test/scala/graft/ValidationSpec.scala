package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r15 ingestion-validation tier: the vector and events validity
  * predicates (LlmQueries.vecTable / Tables.events) and the uniform
  * oracle rewrite that mirrors them — born from the hostile-corpus
  * sweep (`tools/make_hostile.py`), where ONE zero-norm vector killed
  * ~30 queries and a ±1e18 event value broke the micro grids. */
class ValidationSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("validation-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vector validity: admits clean rows, rejects each documented junk class") {
    val sp = spark
    import sp.implicits._
    val rows: Seq[(Long, Option[Seq[Option[Float]]], Option[Int])] = Seq(
      (1L, Some(Seq(Some(0.5f), Some(-0.25f))), Some(0)),   // valid
      (2L, None, Some(0)),                                  // null embedding
      (3L, Some(Seq(Some(0f), Some(0f))), Some(0)),         // zero norm
      (4L, Some(Seq(Some(Float.NaN), Some(1f))), Some(0)),  // NaN component
      (5L, Some(Seq(Some(1e30f), Some(1f))), Some(0)),      // out of domain
      (6L, Some(Seq(None, Some(1f))), Some(0)),             // null element
      (7L, Some(Seq(Some(1f), Some(1f))), None),            // null label
      (8L, Some(Seq(Some(Float.PositiveInfinity), Some(1f))), Some(0)))
    val df = rows.toDF("vec_id", "embedding", "label")
    // the exact predicate vecTable applies (kept textually in sync by
    // this test failing if the engine predicate drifts)
    val kept = df.filter(expr(
      "label IS NOT NULL AND embedding IS NOT NULL AND size(filter(embedding," +
        " x -> x IS NULL OR isnan(x) OR abs(x) > 1000000)) = 0" +
        " AND size(filter(embedding, x -> x <> 0)) > 0"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"only the clean row survives: $kept")
  }

  test("events validity: NULL value admitted, NULL ts / NaN / Inf / |v|>1e12 rejected") {
    val sp = spark
    import sp.implicits._
    val t0 = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val df = Seq(
      (1L, t0, Some(5.0)), (2L, t0, None), (3L, t0, Some(Double.NaN)),
      (4L, t0, Some(-1e18)), (5L, t0, Some(Double.PositiveInfinity)),
      (6L, t0, Some(1e12)), (7L, t0, Some(-1e12 - 1)),
      (8L, None, Some(5.0))) // timeless event: no window can place it
      .toDF("event_id", "ts", "value")
    val kept = df.filter(expr(Tables.EventsValidSql))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 6L), s"got $kept")
  }

  test("documents validity: NULL text/source rejected; NULL lang admitted") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Some("hello"), Some("en"), Some("src0")),
      (2L, None, Some("en"), Some("src0")),         // no text
      (3L, Some(""), None, Some("src1")),           // empty text, no lang: ok
      (4L, Some("x"), Some("en"), None))            // no provenance
      .toDF("doc_id", "text", "lang", "source")
    val kept = df.filter(expr(Tables.DocsValidSql))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"got $kept")
  }

  test("every oracle reads embeddings and events through the validated subquery") {
    // the SparkEntry rewrite is the oracle-side mirror of the engine
    // tier; an oracle that somehow re-introduced a raw read would fork
    // the population invisibly on clean data — make it a test failure.
    for ((name, sql) <- SparkEntry.oracleSql) {
      var idx = sql.indexOf("FROM embeddings")
      while (idx >= 0) {
        assert(sql.regionMatches(idx, "FROM embeddings WHERE label IS NOT NULL",
          0, "FROM embeddings WHERE label IS NOT NULL".length),
          s"$name reads embeddings outside the validation tier at char $idx")
        idx = sql.indexOf("FROM embeddings", idx + 1)
      }
      var j = sql.indexOf("FROM events")
      while (j >= 0) {
        assert(sql.regionMatches(j, "FROM events WHERE ts IS NOT NULL",
          0, "FROM events WHERE ts IS NOT NULL".length),
          s"$name reads events outside the validation tier at char $j")
        j = sql.indexOf("FROM events", j + 1)
      }
      var d = sql.indexOf("FROM documents")
      while (d >= 0) {
        assert(sql.regionMatches(d, "FROM documents WHERE text IS NOT NULL",
          0, "FROM documents WHERE text IS NOT NULL".length),
          s"$name reads documents outside the validation tier at char $d")
        d = sql.indexOf("FROM documents", d + 1)
      }
    }
  }
}
