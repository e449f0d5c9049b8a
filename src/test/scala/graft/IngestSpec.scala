package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planted geometries for the raw-web ingest operators (q275 HTML
  * boilerplate extraction, q276 mojibake repair): the block classifier
  * on nav-only / article / link-heavy pages, hostile HTML (unclosed
  * tags, entity round-trips, embedded newlines), and the repair chain's
  * exact inverses plus its documented replacement order.
  */
class IngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ingest-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pages(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "html")
  }

  private def stats(rows: (Long, String)*) =
    operators.IngestQueries.htmlBlockStats(pages(rows: _*))
      .orderBy(col("doc_id"), col("blk")).collect()

  test("q275 planted geometries: nav dropped, article kept, ad dropped") {
    val article = "An actual paragraph of content that easily clears " +
      "the thirty character floor."
    val r = stats(
      1L -> ("<section><a href=\"/a\">Home</a> <a href=\"/b\">About</a>" +
        "</section>" +
        s"<section><p>$article</p> <a href=\"/s\">Share</a></section>" +
        "<section><a href=\"/buy\">Buy now</a></section>"))
    assert(r.length == 3)
    // nav: all text except inter-link spaces is link text → density
    // far above the threshold → dropped
    assert(!r(0).getBoolean(r(0).fieldIndex("keep")))
    assert(r(0).getLong(r(0).fieldIndex("ld_pct")) == 90L)
    // article: long text, one short link → kept, content extracted
    assert(r(1).getBoolean(r(1).fieldIndex("keep")))
    assert(r(1).getString(r(1).fieldIndex("main_text")) ==
      s"$article Share")
    // ad: pure link → dropped, main_text empty
    assert(!r(2).getBoolean(r(2).fieldIndex("keep")))
    assert(r(2).getString(r(2).fieldIndex("main_text")).isEmpty)
  }

  test("q275 short text is boilerplate even without links") {
    val r = stats(1L -> "<section><p>too short</p></section>")
    assert(r.length == 1)
    assert(r(0).getLong(r(0).fieldIndex("ld_pct")) == 0L)
    assert(!r(0).getBoolean(r(0).fieldIndex("keep")))
  }

  test("q275 hostile HTML: unclosed section degrades to zero blocks, not a crash") {
    val r = stats(
      1L -> "<section><p>an unclosed block never terminates",
      2L -> ("<section>closed before " +
        "<section>a nested opener</section>"))
    // doc 1: no match at all; doc 2: lazy body closes at the first
    // </section> (one block) — both degrade, neither throws
    assert(r.count(_.getLong(0) == 1L) == 0)
    assert(r.count(_.getLong(0) == 2L) == 1)
  }

  test("q275 entity round-trip and embedded newlines") {
    val txt = "A < B & B > C with enough padding to clear the floor."
    val esc = txt.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val r = stats(1L -> s"<section><p>line one\nline two $esc</p></section>")
    assert(r.length == 1, "(?s) must let the block span the newline")
    assert(r(0).getBoolean(r(0).fieldIndex("keep")))
    assert(r(0).getString(r(0).fieldIndex("main_text")) ==
      s"line one line two $txt")
  }

  test("q275 density arithmetic is the half-up integer grid") {
    // text_len 40, link_len 13 → (2·1300 + 40) DIV 80 = 33 → kept at
    // the boundary; one more link char → (2·1400 + 41) DIV 82 = 34 →
    // dropped
    val pad = "x" * 26 // 26 + 1 space + 13 link chars = 40 chars
    val r = stats(
      1L -> s"<section>$pad <a href=\"/l\">thirteen chxr</a></section>",
      2L -> s"<section>$pad <a href=\"/l\">fourteen chxrs</a></section>")
    assert(r(0).getLong(r(0).fieldIndex("text_len")) == 40L)
    assert(r(0).getLong(r(0).fieldIndex("ld_pct")) == 33L)
    assert(r(0).getBoolean(r(0).fieldIndex("keep")))
    assert(r(1).getLong(r(1).fieldIndex("ld_pct")) == 34L)
    assert(!r(1).getBoolean(r(1).fieldIndex("keep")))
  }

  private def repair(s0: String): String = {
    val sp = spark
    import sp.implicits._
    Seq(s0).toDF("c")
      .select(expr(operators.IngestQueries.mojiRepairSqlOf("c")).as("r"))
      .head().getString(0)
  }

  test("q276 repair chain inverts the planted CP1252 double-encoding exactly") {
    assert(repair(operators.IngestQueries.MojiSuffix) ==
      operators.IngestQueries.MojiCleanSuffix)
    // clean text is a fixed point — repair never corrupts correct UTF-8
    assert(repair(operators.IngestQueries.MojiCleanSuffix) ==
      operators.IngestQueries.MojiCleanSuffix)
  }

  test("q276 replacement order: 'â€“' resolves before 'â€œ' can feed it") {
    // 'â€' + '“' IS the en-dash mojibake (0x93 renders as '“'): the
    // chain must repair it to '–' — and because 'â€“' runs first, the
    // 'â€œ'→'“' rule can never synthesize a new match afterwards
    assert(repair("aâ€“b") == "a–b")
  }

  test("q276 planted pairs merge under the repaired fingerprint, not raw") {
    val out = SparkEntry.queries("q276_mojibake_repair")(spark, dir)
      .limit(50).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(!r.getBoolean(r.fieldIndex("merged_raw")),
        "raw twins must differ")
      assert(r.getBoolean(r.fieldIndex("merged")),
        "repaired twins must merge")
      assert(r.getLong(r.fieldIndex("markers")) >= 7L,
        "all seven planted sequences must be counted")
    }
  }

  test("q275 end-to-end on the corpus: main article kept for every long doc") {
    val out = SparkEntry.queries("q275_html_extract")(spark, dir)
    val perDoc = out.groupBy(col("doc_id"))
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_kept"),
        count(lit(1)).as("n_blocks"))
      .collect()
    assert(perDoc.nonEmpty)
    for (r <- perDoc) {
      val blocks = r.getLong(r.fieldIndex("n_blocks"))
      assert(blocks == 3L || blocks == 4L) // ad section on doc_id ≡ 3 (mod 7)
      assert(r.getLong(r.fieldIndex("n_kept")) <= 1L,
        "nav/ad/footer must never be kept")
    }
  }

  // ------------------------------------------------------------- q277

  private def canon(urls: String*): Seq[String] = {
    val sp = spark
    import sp.implicits._
    val raw = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    operators.IngestQueries.canonicalized(raw)
      .orderBy(col("doc_id")).collect()
      .map(_.getString(2)).toSeq // (doc_id, url, canon_url)
  }

  test("q277 canonicalizer: the four raw spellings of one page merge") {
    val c = canon(
      "http://site4.org/article/4?id=4&lang=en",
      "HTTP://WWW.SITE4.ORG:80/article/4?lang=en&id=4#top",
      "http://www.site4.org/article/4/?id=4&utm_source=feed&utm_campaign=w12&lang=en",
      "http://site4.org/article/4?fbclid=x9&lang=en&id=4#s2")
    assert(c.distinct == Seq("http://site4.org/article/4?id=4&lang=en"))
  }

  test("q277 canonicalizer keeps what must be kept") {
    // non-default port survives; http vs https never merge; a non-utm
    // param whose VALUE mentions utm survives the name rule
    val c = canon(
      "http://a.com:8080/x?b=1",
      "http://a.com/x?b=1",
      "https://a.com/x?b=1",
      "http://a.com/x?ref=utm_test&b=1")
    assert(c(0) == "http://a.com:8080/x?b=1")
    assert(c(1) == "http://a.com/x?b=1")
    assert(c(2) == "https://a.com/x?b=1")
    assert(c(3) == "http://a.com/x?b=1&ref=utm_test")
    assert(c.distinct.size == 4)
  }

  test("q277 canonicalizer: root path, empty query, bare host") {
    val c = canon(
      "http://a.com",
      "http://a.com/",
      "http://a.com/?utm_source=x",
      "http://a.com/#frag")
    assert(c.distinct == Seq("http://a.com/"))
  }

  test("q277 hostile URLs degrade deterministically, never crash") {
    // schemeless / empty / junk inputs: every regexp_extract yields ''
    // and the canonical form is degenerate but stable
    val c = canon("not a url", "", "://", "http//missing.colon/x")
    assert(c.forall(_ == ":///"))
    // and a second run produces the same strings (pure expressions)
    assert(canon("not a url") == Seq(":///"))
  }

  test("q278 registrable domain: suffix rule with its guards") {
    val sp = spark
    import sp.implicits._
    val hosts = Seq(
      (1L, "site4.co.uk"), (2L, "a.b.site4.co.uk"), (3L, "site4.com"),
      (4L, "deep.sub.site4.com"), (5L, "co.uk"), (6L, "x.org.uk"))
      .toDF("doc_id", "host")
    val out = operators.IngestQueries.withRegistrableDomain(hosts)
      .orderBy(col("doc_id")).collect().map(_.getString(2)).toSeq
    assert(out == Seq("site4.co.uk", "site4.co.uk", "site4.com",
      "site4.com", "co.uk", "x.org.uk"))
  }

  test("q278 end-to-end: cap binds above DomainCap, rare.com stays whole") {
    val out = SparkEntry.queries("q278_domain_caps")(spark, dir).collect()
    val byDom = out.map(r => r.getString(0) -> r).toMap
    assert(byDom.contains("rare.com"))
    val rare = byDom("rare.com")
    assert(rare.getLong(rare.fieldIndex("n_dropped")) == 0L,
      "the under-cap cohort must keep every doc")
    for (r <- out) {
      val kept = r.getLong(r.fieldIndex("n_kept"))
      val docs = r.getLong(r.fieldIndex("n_docs"))
      assert(kept == math.min(docs, operators.IngestQueries.DomainCap.toLong))
      assert(kept + r.getLong(r.fieldIndex("n_dropped")) == docs)
    }
    assert(out.exists(r => r.getLong(r.fieldIndex("n_dropped")) > 0L),
      "the cap must bind somewhere at gate scale")
  }

  test("q281 Bloom guarantee: every inserted URL hits, at any bitmap size") {
    val sp = spark
    import sp.implicits._
    val urls = (1 to 50).map(i => s"http://u$i.com/p").toDF("url")
    for (words <- Seq(2, operators.IngestQueries.BloomWords)) {
      val bm = operators.IngestQueries.urlBloomBitmap(urls, "url", words)
      val probes = urls.select(col("url").as("probe_url"))
      val hits = operators.IngestQueries
        .bloomProbe(probes, bm, "probe_url", words)
        .collect().map(_.getBoolean(1))
      assert(hits.length == 50 && hits.forall(identity),
        s"words=$words: an inserted URL must NEVER miss")
    }
  }

  test("q281 false positives exist at a saturated bitmap and never at the gate size") {
    val sp = spark
    import sp.implicits._
    val urls = (1 to 50).map(i => s"http://u$i.com/p").toDF("url")
    val absent = (1 to 50).map(i => s"http://v$i.org/q").toDF("probe_url")
    // 124 bits, 50 urls x 4 draws: essentially every bit set -> the
    // absent probes MUST collide (the fp mechanism is real)
    val tiny = operators.IngestQueries.urlBloomBitmap(urls, "url", 2)
    val fpTiny = operators.IngestQueries.bloomProbe(absent, tiny, "probe_url", 2)
      .collect().count(_.getBoolean(1))
    assert(fpTiny > 0, "a saturated bitmap must produce false positives")
    // gate size: 63k bits at load 50x4 -> fp probability per probe
    // ~(200/63488)^4 < 1e-10; all 50 absent probes miss
    val big = operators.IngestQueries.urlBloomBitmap(
      urls, "url", operators.IngestQueries.BloomWords)
    val fpBig = operators.IngestQueries.bloomProbe(absent, big, "probe_url")
      .collect().count(_.getBoolean(1))
    assert(fpBig == 0)
  }

  test("q282 precedence: longest prefix wins; an equal-length tie goes to allow") {
    val sp = spark
    import sp.implicits._
    val urls = Seq(
      (1L, "site0.com", "/article/140"), // /article/1 override beats /article/
      (2L, "site0.com", "/article/28"), // /article/2 tie -> allow
      (3L, "site0.com", "/article/364"), // /article/ deny
      (4L, "site0.com", "/other/7"), // /other/ deny everywhere
      (5L, "site4.com", "/article/364"), // odd-name domain: only '/' -> allow
      (6L, "rare.com", "/article/300")) // rare is in the even set -> deny
      .toDF("doc_id", "host", "path")
    val out = operators.IngestQueries.robotVerdicts(urls)
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(out(1L) == ("allow", "/article/1"))
    assert(out(2L) == ("allow", "/article/2"))
    assert(out(3L) == ("deny", "/article/"))
    assert(out(4L) == ("deny", "/other/"))
    assert(out(5L) == ("allow", "/"))
    assert(out(6L) == ("deny", "/article/"))
  }
}
