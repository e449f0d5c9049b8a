package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-web ingest operators — the two standard stages a CCNet/
  * RefinedWeb-style pipeline runs BEFORE everything the engine already
  * has (lang-ID q31, quality q137, normalization-dedup q142 all assume
  * clean text):
  *
  *  - q275: HTML boilerplate extraction — tag-strip plus the classic
  *    link-density/text-length block heuristic (jusText/Readability
  *    family, reduced to integer arithmetic so the DuckDB oracle can
  *    replicate the scoring bit-for-bit). No external parser: block
  *    segmentation, tag stripping, entity decode, and link-text
  *    accounting are all codegen'd regexp/replace expressions.
  *  - q276: encoding-repair (ftfy-tier) — undo the two dominant
  *    double-encoding corruptions of web text (UTF-8 bytes re-decoded
  *    as CP1252: accented Latin-1 'Ã©'-class and the 'â€¦'-class
  *    punctuation) as a deterministic replace chain, then prove the
  *    repaired text merges with its clean twin under the q142
  *    normalization fingerprint.
  *
  * The reference (a file converter, `/root/reference/pq2json/src/
  * converter.rs`) has neither; both are Spark-first: one corpus scan,
  * every operation map-side (string expressions inside whole-stage
  * codegen), the only exchange the output sort. At 100 TB each is an
  * embarrassingly parallel projection — no join, no agg, no skew
  * surface.
  */
object IngestQueries extends QueryModule {

  // ---------------------------------------------------------------- q275

  /** Escape of the document text embedded into the synthesized page —
    * and the inverse applied after tag-stripping, so extraction
    * round-trips the original text exactly (the spec pins this).
    * Shared SQL text, valid in BOTH engines. */
  private[graft] val HtmlEscSql: String =
    "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  /** The synthesized raw_html page per document (the harness corpus
    * has no raw-HTML column, so the page is constructed
    * DETERMINISTICALLY from (doc_id, text) — same construction SQL
    * interpolated into engine and oracle, the [[LlmQueries]] planted-
    * corpus discipline). Geometry: a nav block (pure links — must be
    * dropped), the main article (the escaped document text — kept
    * whenever the text clears the length floor), an ad block on
    * doc_id ≡ 3 (mod 7) (pure links — dropped), and a link-heavy
    * footer (dropped by density). Top-level &lt;section&gt; elements
    * ARE the block segmentation — the honest simplification of
    * DOM-block splitting that keeps the operator parser-free. */
  private[graft] val RawHtmlSql: String =
    "'<html><head><title>Doc</title></head><body>" +
      "<section class=\"nav\"><a href=\"/\">Home</a> " +
      "<a href=\"/about\">About us</a> " +
      "<a href=\"/contact\">Contact</a></section>" +
      "<section class=\"main\"><h1>Story</h1> <p>' || " + HtmlEscSql +
      " || '</p> <a href=\"/share\">Share</a></section>' || " +
      "CASE WHEN doc_id % 7 = 3 THEN " +
      "'<section class=\"ad\"><a href=\"/buy\">Buy now</a> " +
      "<a href=\"/deal\">Hot deal</a></section>' ELSE '' END || " +
      "'<section class=\"footer\">(c) 2026 Example Site " +
      "<a href=\"/privacy\">Privacy policy</a> " +
      "<a href=\"/terms\">Terms of use</a> " +
      "<a href=\"/imprint\">Imprint</a></section>" +
      "</body></html>'"

  /** Block = top-level section element; lazy body with (?s) so
    * embedded newlines in document text cannot break segmentation.
    * An unclosed section never matches — a malformed page degrades to
    * fewer blocks, never a crash (hostile-input contract, spec-pinned). */
  private[graft] val SectionPat = "(?s)<section[^>]*>(.*?)</section>"
  private[graft] val AnchorPat = "(?s)<a [^>]*>(.*?)</a>"

  /** jusText-family thresholds on the INTEGER grid: a block is content
    * iff its decoded text is ≥ 30 chars AND its half-up link-density
    * percent is ≤ 33. Interpolated verbatim into the oracle. */
  private[graft] val MinBlockChars = 30L
  private[graft] val MaxLinkDensityPct = 33L

  /** Decoded, whitespace-collapsed text of a block column (Spark SQL
    * text): strip tags → decode the three escaped entities (&lt;/&gt;
    * before &amp;, so escaped '&lt;' in the source text round-trips) →
    * collapse runs of whitespace. */
  private def contentSqlOf(c: String): String =
    s"trim(regexp_replace(replace(replace(replace(" +
      s"regexp_replace($c, '(?s)<[^>]*>', ' '), " +
      "'&lt;', '<'), '&gt;', '>'), '&amp;', '&'), " +
      s"'${LlmQueries.WsClass}+', ' '))"

  /** q275's engine over an explicit (doc_id, html) frame — factored so
    * the spec can drive planted geometries (nav-only page, article
    * page, unclosed tags, entity round-trips) without the synthesized
    * corpus. One row per (doc, block): integer text/link lengths, the
    * half-up link-density percent, the keep verdict, and the extracted
    * content for kept blocks. Everything map-side. */
  private[graft] def htmlBlockStats(pages: DataFrame): DataFrame =
    pages
      .select(col("doc_id"), posexplode(expr(
        s"regexp_extract_all(html, '$SectionPat', 1)")).as(Seq("i", "bk")))
      .withColumn("content", expr(contentSqlOf("bk")))
      .withColumn("text_len", length(col("content")).cast("long"))
      .withColumn("link_len", expr(
        s"aggregate(regexp_extract_all(bk, '$AnchorPat', 1), 0L, " +
          "(a, x) -> a + length(x))"))
      // half-up integer percent; an all-markup block (text_len 0) is
      // boilerplate by definition → density 100
      .withColumn("ld_pct", expr(
        "IF(text_len = 0, 100L, " +
          "(2 * link_len * 100 + text_len) DIV (2 * text_len))"))
      .withColumn("keep",
        col("text_len") >= MinBlockChars && col("ld_pct") <= MaxLinkDensityPct)
      .select(col("doc_id"), (col("i") + 1).cast("long").as("blk"),
        col("text_len"), col("link_len"), col("ld_pct"), col("keep"),
        when(col("keep"), col("content")).otherwise(lit("")).as("main_text"))

  // ---------------------------------------------------------------- q276

  /** The seven dominant mojibake sequences (UTF-8 bytes of é ï ü “ ’ –
    * … re-decoded as CP1252) and their repairs. ORDER MATTERS and is
    * part of the contract: 'â€“' runs before 'â€œ' because the latter's
    * output (U+201C) is the former's third character — the reverse
    * order could cascade a fresh match on adversarial input. The same
    * chain, same order, is interpolated into the oracle. */
  private[graft] def mojiRepairSqlOf(c: String): String =
    s"replace(replace(replace(replace(replace(replace(replace($c, " +
      "'â€“', '–'), " + // â€“ → – (en dash)
      "'â€™', '’'), " + // â€™ → ’
      "'â€¦', '…'), " + // â€¦ → …
      "'â€œ', '“'), " + // â€œ → “
      "'Ã©', 'é'), " + //        Ã© → é
      "'Ã¯', 'ï'), " + //        Ã¯ → ï
      "'Ã¼', 'ü')" //           Ã¼ → ü

  /** The planted pair: every document gets a CLEAN twin (typographic
    * suffix in correct UTF-8) and a MOJIBAKE twin (the same suffix as
    * its CP1252 double-encoding). Deterministic construction shared
    * with the oracle; repair(moji twin) ≡ clean twin by the chain
    * above, so the pair merges under the q142 fingerprint. */
  private[graft] val MojiCleanSuffix =
    " café naïve “quote’s – über…"
  private[graft] val MojiSuffix =
    " cafÃ© naÃ¯ve " +
      "â€œquoteâ€™s â€“ " +
      "Ã¼berâ€¦"

  /** q142's normalization applied to the REPAIRED text — the
    * fingerprint under which a mojibake twin merges with its clean
    * source (Spark SQL text; the oracle runs the same chain with
    * DuckDB's regexp flags). */
  private def mojiFpSqlOf(c: String): String =
    s"lower(trim(regexp_replace(${mojiRepairSqlOf(c)}, " +
      s"'${LlmQueries.WsClass}+', ' ')))"

  /** The oracle's spelling of the same fingerprint (DuckDB
    * regexp_replace needs the explicit 'g' flag; \s ≡ WsClass in RE2). */
  private def mojiFpDuckOf(c: String): String =
    s"lower(trim(regexp_replace(${mojiRepairSqlOf(c)}, '\\s+', ' ', 'g')))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- HTML boilerplate extraction (q275): the first stage of every
    // raw-web training-data pipeline. Page synthesis + block scoring
    // are one map-side projection chain (regexp/replace inside
    // whole-stage codegen); rows out = docs × blocks; the only
    // exchange is the output sort. Row-level oracle: DuckDB rebuilds
    // the identical pages and replicates the integer block scoring.
    "q275_html_extract" -> ((s, dir) => {
      val pages = Tables.documents(s, dir)
        .select(col("doc_id"), expr(RawHtmlSql).as("html"))
      htmlBlockStats(pages).orderBy(col("doc_id"), col("blk"))
    }),

    // --- encoding repair / mojibake normalization (q276): the sibling
    // ingest stage. Per document: the mojibake-marker census of the
    // corrupted twin, proof the RAW twins do NOT merge, proof the
    // REPAIRED twins DO merge under the q142 fingerprint, and the
    // fingerprint itself. Pure map-side replace chains; scale shape
    // identical to q275.
    "q276_mojibake_repair" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr(s"text || '$MojiCleanSuffix'").as("clean"),
          expr(s"text || '$MojiSuffix'").as("moji"))
        .select(col("doc_id"),
          // marker census: 'Ã' is one char per Latin-1-class hit,
          // 'â€' two chars per punctuation-class hit
          expr("CAST((length(moji) - length(replace(moji, 'Ã', ''))) " +
            "+ ((length(moji) - length(replace(moji, 'â€', ''))) DIV 2) " +
            "AS BIGINT)").as("markers"),
          (md5(col("clean")) === md5(col("moji"))).as("merged_raw"),
          (md5(expr(mojiFpSqlOf("clean"))) ===
            md5(expr(mojiFpSqlOf("moji")))).as("merged"),
          md5(expr(mojiFpSqlOf("clean"))).as("fp"))
        .orderBy(col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q275_html_extract" ->
      s"""WITH raw AS (SELECT doc_id, $RawHtmlSql AS html FROM documents),
         |b AS (SELECT doc_id,
         |        regexp_extract_all(html, '$SectionPat', 1) AS blks
         |      FROM raw),
         |e AS (SELECT doc_id, unnest(range(1, len(blks) + 1)) AS blk,
         |        unnest(blks) AS bk FROM b),
         |m AS (SELECT doc_id, blk,
         |        trim(regexp_replace(replace(replace(replace(
         |          regexp_replace(bk, '(?s)<[^>]*>', ' ', 'g'),
         |          '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
         |          '\\s+', ' ', 'g')) AS content,
         |        CAST(coalesce(list_sum(list_transform(
         |          regexp_extract_all(bk, '$AnchorPat', 1),
         |          x -> length(x))), 0) AS BIGINT) AS link_len
         |      FROM e),
         |f AS (SELECT doc_id, blk, CAST(length(content) AS BIGINT) AS text_len,
         |        link_len, content FROM m),
         |g AS (SELECT doc_id, blk, text_len, link_len,
         |        CASE WHEN text_len = 0 THEN 100
         |          ELSE (2 * link_len * 100 + text_len) // (2 * text_len)
         |        END AS ld_pct, content FROM f)
         |SELECT doc_id, CAST(blk AS BIGINT) AS blk, text_len, link_len,
         |  CAST(ld_pct AS BIGINT) AS ld_pct,
         |  (text_len >= $MinBlockChars AND ld_pct <= $MaxLinkDensityPct)
         |    AS keep,
         |  CASE WHEN text_len >= $MinBlockChars
         |    AND ld_pct <= $MaxLinkDensityPct
         |    THEN content ELSE '' END AS main_text
         |FROM g ORDER BY doc_id, blk""".stripMargin,

    "q276_mojibake_repair" ->
      s"""WITH d AS (SELECT doc_id,
         |        text || '$MojiCleanSuffix' AS clean,
         |        text || '$MojiSuffix' AS moji
         |      FROM documents)
         |SELECT doc_id,
         |  CAST((length(moji) - length(replace(moji, 'Ã', '')))
         |    + ((length(moji) - length(replace(moji, 'â€', ''))) // 2)
         |    AS BIGINT) AS markers,
         |  (md5(clean) = md5(moji)) AS merged_raw,
         |  (md5(${mojiFpDuckOf("clean")}) = md5(${mojiFpDuckOf("moji")}))
         |    AS merged,
         |  md5(${mojiFpDuckOf("clean")}) AS fp
         |FROM d ORDER BY doc_id""".stripMargin
  )
}
