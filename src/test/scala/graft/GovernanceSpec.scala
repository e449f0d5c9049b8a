package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic proofs for the governance module (q204-q211): the claims
  * each operator makes are re-derived independently inside the engine —
  * conservation identities (row totals), the incremental-maintenance
  * theorem (merge == recompute, asserted per bucket), exact-quantile
  * equality against a brute-force global sort, and checksum
  * order-independence. The DuckDB oracle proves cross-engine agreement;
  * these prove the operator's own invariants hold for reasons the hash
  * gate cannot see.
  */
class GovernanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("governance-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q204: class rows conserve the customer count; risk bounded by the k<5 mass") {
    val out = q("q204_k_anonymity").collect()
    val total = Tables(spark, dir, "customer").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == total,
      "equivalence classes must partition the table — no row lost or duplicated")
    out.foreach { r =>
      val singles = r.getAs[Long]("singleton_classes")
      assert(singles <= r.getAs[Long]("rows_below_k5"),
        "singleton rows are a subset of the below-k5 mass")
      assert(r.getAs[Long]("min_k") >= 1)
      val risk = r.getAs[Double]("reident_risk")
      assert(risk >= 0.0 && risk <= 1.0)
      // the grid value is the half-up ratio of the two integer columns
      val expect = (2 * singles * 1000000L + r.getAs[Long]("n_rows")) /
        (2 * r.getAs[Long]("n_rows"))
      assert(math.abs(risk - expect / 1e6) < 1e-12)
    }
  }

  test("q206: the merge==recompute theorem holds in every bucket, and totals conserve") {
    val out = q("q206_incremental_agg").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("all_match")),
      "partial-state merge must equal the full recompute for every user")
    val evs = Tables(spark, dir, "events").count()
    assert(out.map(_.getAs[Long]("n_events")).sum == evs,
      "per-bucket event totals must conserve the events count")
  }

  test("q207: histogram-refined quantiles equal the brute-force global sort") {
    val out = q("q207_exact_quantiles").collect()
      .map(r => r.getAs[String]("quantile") ->
        (r.getAs[Long]("rank"), r.getAs[Double]("value"))).toMap
    assert(out.keySet == Set("p25", "p50", "p75", "p99"))
    val cents = Tables(spark, dir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + 0.5).as("c"))
      .orderBy(col("c")).collect().map(_.getAs[Long]("c"))
    val n = cents.length
    for ((label, qn) <- Seq("p25" -> 25, "p50" -> 50, "p75" -> 75, "p99" -> 99)) {
      val rank = (n.toLong * qn + 99) / 100
      assert(out(label)._1 == rank, s"$label rank")
      assert(out(label)._2 == cents(rank.toInt - 1) / 100.0,
        s"$label must be the rank-th smallest value exactly")
    }
  }

  test("q209: top-20 deviations are ordered, nonnegative, and absences score") {
    val rows = q("q209_seasonal_anomaly").collect()
    assert(rows.length == 20)
    val devs = rows.map(_.getAs[Double]("deviation"))
    assert(devs.zip(devs.tail).forall { case (a, b) => a >= b },
      "output carries the selection order")
    assert(devs.forall(_ >= 0.0))
    rows.foreach { r =>
      // deviation is |obs - expected| on the shared grid: off by at most
      // one micro from recomputing with the two rounded outputs
      val d = math.abs(r.getAs[Long]("obs") - r.getAs[Double]("expected"))
      assert(math.abs(d - r.getAs[Double]("deviation")) < 2e-6, r.toString)
    }
  }

  test("q210: gini bounds and exact brute-force agreement per source") {
    val rows = q("q210_token_gini").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
      assert(r.getAs[Long]("tokens") >= r.getAs[Long]("vocab"))
      assert(r.getAs[Double]("top_share") * r.getAs[Long]("vocab") >=
        1.0 - r.getAs[Long]("vocab") * 1e-6,
        "top token share can never be below 1/vocab (modulo one grid step)")
    }
    // brute-force one source: sorted freqs, direct Gini formula
    val src = rows.head.getAs[String]("source")
    val freqs = Tables(spark, dir, "documents")
      .filter(col("source") === src)
      .select(explode(expr("split(trim(text), '\\\\s+')")).as("t"))
      .groupBy("t").count().collect().map(_.getAs[Long]("count")).sorted
    val v = freqs.length.toLong
    val tot = freqs.sum
    val w = freqs.zipWithIndex.map { case (f, i) => (i + 1L) * f }.sum
    val num = 2 * (2 * w - (v + 1) * tot) * 1000000L + v * tot
    val giniMicro = num / (2 * v * tot)
    assert(math.abs(rows.head.getAs[Double]("gini") - giniMicro / 1e6) < 1e-12)
  }

  test("q205: tagged phrases come from the derived dictionary and occur in the doc") {
    import org.apache.spark.sql.Row
    val out = q("q205_phrase_blocklist").collect()
    assert(out.nonEmpty)
    // recompute the dictionary independently (top-10 per-doc-distinct
    // bigrams by document frequency, tie on phrase)
    val bi = Tables(spark, dir, "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "array_distinct(zip_with(slice(tk, 1, size(tk) - 1), " +
          "slice(tk, 2, size(tk) - 1), (a, b) -> concat(a, ' ', b)))")).as("p"))
    val dict = bi.groupBy("p").count()
      .orderBy(col("count").desc, col("p").asc).limit(10)
      .collect().map(_.getAs[String]("p")).toSet
    val byDoc = bi.collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) => id -> rows.map(_.getAs[String]("p")).toSet }
    out.foreach { case Row(id: Long, n: Long, phrases: String) =>
      val ps = phrases.split('|').toSet
      assert(ps.size == n, s"doc $id: n_phrases must count the listed set")
      assert(ps.subsetOf(dict), s"doc $id lists a phrase outside the dictionary")
      assert(ps.subsetOf(byDoc(id)), s"doc $id lists a phrase it does not contain")
    }
    // completeness: every doc whose bigrams hit the dictionary is tagged
    val expected = byDoc.count(_._2.exists(dict.contains))
    assert(out.length == expected)
  }

  test("q208: aligned band nesting makes the sweep structurally monotone") {
    val rows = q("q208_lsh_param_sweep").collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("candidates"), r.getAs[Long]("tp"),
        r.getAs[Long]("true_pairs")))
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((8, 2), (4, 4), (2, 8)))
    // an r=4 band agreeing implies both aligned r=2 halves agree, so the
    // candidate SETS nest: cand(2,8) <= cand(4,4) <= cand(8,2) — the
    // counts must be monotone, not just probabilistically so
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3,
      "candidates must grow with band count under aligned nesting")
    assert(rows(0)._4 >= rows(1)._4 && rows(1)._4 >= rows(2)._4,
      "true-positive hits must grow with band count")
    rows.foreach { t =>
      assert(t._4 <= t._3, "tp is a subset of candidates")
      assert(t._4 <= t._5, "tp is a subset of the truth")
    }
  }

  test("q212: the two profile sides partition the stream; rates on the shared grid") {
    val rows = q("q212_profile_diff").collect()
    assert(rows.length == 4)
    val total = Tables(spark, dir, "events").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("base_n") + r.getAs[Long]("delta_n") == total)
      assert(r.getAs[Long]("base_distinct") >= 1)
    }
  }

  test("q213: chi-square recomputed from the emitted contingency table") {
    val r = q("q213_ab_test").collect().head
    val (r1, a) = (r.getAs[Long]("arm0_users"), r.getAs[Long]("arm0_conv"))
    val (r2, c) = (r.getAs[Long]("arm1_users"), r.getAs[Long]("arm1_conv"))
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(r1 + r2 == users, "arms partition the user population")
    val det = BigInt(a) * (r2 - c) - BigInt(c) * (r1 - a)
    val den = (BigInt(r1) * r2 * (a + c) * (r1 + r2 - a - c)).max(1)
    val chi2Micro = (2 * (r1 + r2) * det * det * 1000000 + den) / (2 * den)
    assert(math.abs(r.getAs[Double]("chi2") - chi2Micro.toDouble / 1e6) < 1e-9)
  }

  test("q214: window-form CUSUM equals the clamped recurrence, per type") {
    val out = q("q214_cusum_changepoint").collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.size == 5)
    val daily = Tables(spark, dir, "events")
      .select((unix_timestamp(col("ts")) / 86400L).cast("long").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("count")))
    val days = daily.map(_._2).distinct.sorted
    for ((tpe, row) <- out) {
      val byDay = daily.filter(_._1 == tpe).map(t => t._2 -> t._3).toMap
      val xs = days.map(d => byDay.getOrElse(d, 0L))
      val dTot = xs.sum
      val dCnt = days.length.toLong
      // the clamped recurrence, directly: C_t = max(0, C_{t-1} + dev_t)
      var cBest = 0L; var cCur = 0L; var peakDay = days.head; var alarms = 0L
      for ((x, d) <- xs.zip(days)) {
        cCur = math.max(0L, cCur + (10 * x * dCnt - 11 * dTot))
        if (cCur > cBest) { cBest = cCur; peakDay = d }
        if (cCur > 10 * dTot) alarms += 1
      }
      assert(row.getAs[Long]("n_days") == dCnt)
      assert(row.getAs[Long]("total") == dTot)
      assert(row.getAs[Long]("n_alarms") == alarms, s"$tpe alarms")
      assert(row.getAs[Long]("peak_day_epoch") == peakDay * 86400L, s"$tpe peak")
      val grid = (2 * cBest * 1000000L + 10 * dCnt) / (2 * 10 * dCnt)
      assert(math.abs(row.getAs[Double]("max_cusum") - grid / 1e6) < 1e-12, tpe)
    }
  }

  test("q215: every stratum splits EXACTLY 8/1/1 — the property hash splits cannot promise") {
    val rows = q("q215_exact_stratified_split").collect()
    assert(rows.length == 20)
    val docs = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("exact_ok"), r.toString)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_valid") +
        r.getAs[Long]("n_test") == r.getAs[Long]("n_docs"))
    }
  }

  test("q216: purge conserves rows, the deletion set is nonempty, residual is zero") {
    val rows = q("q216_deletion_audit").collect()
    assert(rows.length == 5)
    val total = Tables(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == total)
    assert(rows.map(_.getAs[Long]("n_to_delete")).sum > 0,
      "an audit over an empty deletion set proves nothing")
    rows.foreach { r =>
      assert(r.getAs[Long]("residual_after_purge") == 0L)
      assert(r.getAs[Boolean]("conservation_ok"))
    }
  }

  test("q217: LPT packing conserves mass and meets the greedy balance bound") {
    val rows = q("q217_shard_packing").collect()
    assert(rows.length == 8)
    val sizes = Tables(spark, dir, "documents")
      .groupBy("source").agg(sum("n_chars").cast("long").as("sz"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("sz"))
    assert(rows.map(_.getAs[Long]("load")).sum == sizes.map(_._2).sum)
    assert(rows.map(_.getAs[Long]("n_sources")).sum == sizes.length)
    // replay the greedy directly and compare the full load vector
    val loads = Array.fill(8)(0L); val cnts = Array.fill(8)(0L)
    for ((_, sz) <- sizes.sortBy { case (s, z) => (-z, s) }) {
      val i = loads.indexOf(loads.min); loads(i) += sz; cnts(i) += 1
    }
    assert(rows.map(_.getAs[Long]("load")).toSeq == loads.toSeq)
    assert(rows.map(_.getAs[Long]("n_sources")).toSeq == cnts.toSeq)
    // LPT's structural bound: the heaviest shard exceeds the lightest by
    // at most one source's size
    assert(loads.max - loads.min <= sizes.map(_._2).max)
  }

  test("q219: the bot rule fires on a planted bot and spares a planted human") {
    val ss = spark; import ss.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val bot = (0L until 30L).map(i => (1L, i, at(i * 10)))      // 10 s cadence
    val human = (0L until 10L).map(i => (2L, 100 + i, at(i * 3600))) // hourly
    val df = (bot ++ human).toDF("user_id", "event_id", "ts")
    val out = graft.operators.GovernanceQueries.botStats(df)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("is_bot"), "30 events at 10 s must flag")
    assert(out(1L).getAs[Long]("median_gap") == 10L)
    assert(!out(2L).getAs[Boolean]("is_bot"), "hourly human must not flag")
    assert(out(2L).getAs[Long]("median_gap") == 3600L)
  }

  test("q220: the windowed median-of-slopes equals the brute-force Theil-Sen") {
    val out = q("q220_theil_sen").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope"))).toMap
    assert(out.size == 5)
    val daily = Tables(spark, dir, "events")
      .select((unix_timestamp(col("ts")) / 86400L).cast("long").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").count().collect()
    val days = daily.map(_.getAs[Long]("day")).distinct.sorted
    for (tpe <- out.keys) {
      val byDay = daily.filter(_.getAs[String]("event_type") == tpe)
        .map(r => r.getAs[Long]("day") -> r.getAs[Long]("count")).toMap
      val xs = days.map(d => d -> byDay.getOrElse(d, 0L))
      val slopes = for {
        (di, ci) <- xs; (dj, cj) <- xs if di < dj
      } yield (cj - ci, dj - di, di)
      assert(out(tpe)._1 == slopes.length)
      val sorted = slopes.sortBy { case (n, d, di) =>
        (n.toDouble / d, n, d, di) }
      val (num, den, _) = sorted((slopes.length + 1) / 2 - 1)
      val micro =
        if (num >= 0) (2L * num * 1000000L + den) / (2L * den)
        else -((2L * -num * 1000000L + den) / (2L * den))
      assert(math.abs(out(tpe)._2 - micro / 1e6) < 1e-12, tpe)
    }
  }

  test("q221: the audit's pair universe is exactly the q34 builder's") {
    val r = q("q221_intra_shard_dup_risk").collect().head
    val pairs = SparkEntry.queries("q34_ngram_jaccard")(spark, dir).count()
    assert(r.getAs[Long]("n_pairs") == pairs)
    assert(r.getAs[Long]("n_intra") <= r.getAs[Long]("n_pairs"))
    assert(r.getAs[Double]("intra_share") >= 0.0 &&
      r.getAs[Double]("intra_share") <= 1.0)
  }

  test("q222: NDCG recomputed brute-force for every user") {
    val out = q("q222_ndcg_eval").collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val weights = Array(1000000L, 630930L, 500000L, 430677L, 386853L)
    val byUser = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value")).cast("long").as("rel"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Long]("rel")))
      .groupBy(_._1)
    assert(out.keySet == byUser.keySet)
    for ((u, evs) <- byUser) {
      val rels = evs.sortBy(e => (e._2.getTime, e._3)).take(5).map(_._4)
      val dcg = rels.zip(weights).map { case (r, w) => r * w }.sum
      val idcg = rels.sorted(Ordering[Long].reverse).zip(weights)
        .map { case (r, w) => r * w }.sum
      assert(out(u).getAs[Long]("dcg") == dcg, s"user $u dcg")
      assert(out(u).getAs[Long]("idcg") == idcg, s"user $u idcg")
      val micro = if (idcg == 0) 1000000L
        else (2 * dcg * 1000000L + idcg) / (2 * idcg)
      assert(math.abs(out(u).getAs[Double]("ndcg") - micro / 1e6) < 1e-12)
      assert(dcg <= idcg, "ideal ordering dominates by rearrangement")
    }
  }

  test("q223: the threshold curve is monotone and anchored at the q34 pair set") {
    val rows = q("q223_dedup_threshold_curve").collect()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      Seq(0.5, 0.6, 0.7, 0.8))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs_covered"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      "tightening the threshold can only drop pairs")
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    val q34 = SparkEntry.queries("q34_ngram_jaccard")(spark, dir).count()
    assert(pairs.head == q34, "the 0.5 row IS the q34 pair count")
    rows.foreach { r =>
      assert(r.getAs[Double]("doc_share") >= 0.0 &&
        r.getAs[Double]("doc_share") <= 1.0)
      assert(r.getAs[Long]("n_docs_covered") <= 2 * r.getAs[Long]("n_pairs"),
        "each pair covers at most two docs")
    }
  }

  test("q224: planted null / NaN / zero-norm / ragged vectors each fire their counter") {
    val ss = spark; import ss.implicits._
    val good = Seq(0.6f, 0.8f)
    val planted = Seq(
      (0, Some(good)),                      // healthy: norm² = 1.0
      (0, None),                            // null vector
      (0, Some(Seq(Float.NaN, 1.0f))),      // NaN element
      (0, Some(Seq(0.0f, 0.0f))),           // zero norm
      (1, Some(Seq(1.0f)))                  // ragged dim (1 vs 2)
    ).toDF("label", "embedding")
    val out = graft.operators.SketchQueries.embeddingHealth(planted)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    val l0 = out(0)
    assert(l0.getAs[Long]("n_vecs") == 4)
    assert(l0.getAs[Long]("n_null") == 1)
    assert(l0.getAs[Long]("n_nan") == 1)
    assert(l0.getAs[Long]("n_zero_norm") == 1)
    assert(l0.getAs[Int]("dim_min") == 2 && l0.getAs[Int]("dim_max") == 2)
    assert(out(1).getAs[Int]("dim_min") == 1)
    // the healthy 3-4-5 vector: norm² = 0.36 + 0.64 = 1.0 on the grid
    assert(math.abs(l0.getAs[Double]("min_norm2") - 0.0) < 1e-12)
    // real corpus: clean across the board
    val real = q("q224_embedding_health").collect()
    assert(real.length == 10)
    real.foreach { r =>
      assert(r.getAs[Long]("n_null") == 0 && r.getAs[Long]("n_nan") == 0)
      assert(r.getAs[Int]("dim_min") == 64 && r.getAs[Int]("dim_max") == 64)
    }
  }

  test("q225: diversity bounds — 1 <= effective langs <= n_langs, simpson inverts") {
    val rows = q("q225_lang_diversity").collect()
    assert(rows.length == 20)
    val docs = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    rows.foreach { r =>
      val eff = r.getAs[Double]("effective_langs")
      val nl = r.getAs[Long]("n_langs")
      assert(eff >= 1.0 - 1e-6 && eff <= nl + 1e-6,
        s"effective langs must lie in [1, n_langs]: $r")
      val simpson = r.getAs[Double]("simpson")
      assert(simpson >= 1.0 / nl - 1e-6 && simpson <= 1.0 + 1e-6)
      // the two grids are reciprocal up to grid rounding
      assert(math.abs(eff * simpson - 1.0) < 2e-3, r.toString)
    }
  }

  test("q211: both checksum paths agree and conserve the corpus") {
    val rows = q("q211_conservation_check").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("matches")),
      "direct and via-shard checksums must agree per source")
    val docs = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    // and the checksum actually detects loss: drop one doc, recompute one
    // source's checksum with the same arithmetic — it must move
    graft.functions.GraftFunctions.register(spark)
    val d = Tables(spark, dir, "documents")
      .filter(col("source") === rows.head.getAs[String]("source"))
      .select(expr("fnv64(concat(CAST(doc_id AS STRING), ':', md5(text)))").as("fp"))
    val p = 2305843009213693951L
    def cs(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr(s"CAST(((SUM(CAST(fp AS DECIMAL(38,0))) % $p) + $p) % $p AS BIGINT)"))
        .collect().head.getLong(0)
    val full = cs(d)
    val lossy = cs(d.limit(d.count().toInt - 1))
    assert(full == rows.head.getAs[Long]("checksum"))
    assert(full != lossy, "a lost row must move the checksum")
  }

  test("q226: closed-form AUC plants — separation 1.0, ties 0.5, inversion 0.0") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.aucBySource
    def f(rows: (String, Long, Boolean)*) =
      rows.toSeq.toDF("source", "lg_micro", "pos")
    val sep = aucBySource(f(("a", 10L, true), ("a", 20L, true),
      ("a", 1L, false), ("a", 2L, false))).collect().head
    assert(sep.getAs[Long]("w2") == 8 && sep.getAs[Double]("auc") == 1.0,
      "every pos above every neg -> AUC exactly 1")
    val tie = aucBySource(f(("a", 5L, true), ("a", 5L, true),
      ("a", 5L, false), ("a", 5L, false), ("a", 5L, false)))
      .collect().head
    assert(tie.getAs[Long]("w2") == 6 && tie.getAs[Double]("auc") == 0.5,
      "all-tied scores -> AUC exactly 1/2 (w2 = ties)")
    val inv = aucBySource(f(("a", 1L, true), ("a", 5L, false)))
      .collect().head
    assert(inv.getAs[Long]("w2") == 0 && inv.getAs[Double]("auc") == 0.0)
    // a source missing a class is excluded (AUC undefined there)
    assert(aucBySource(f(("b", 3L, true), ("b", 4L, true))).collect().isEmpty)
  }

  test("q226: the rank-sum AUC equals the brute-force pair count on real data") {
    val d = Tables(spark, dir, "documents")
    val scored = operators.CorpusQueries.repetitionStats(d)
      .select(col("doc_id"), col("source"),
        (col("pass_top") && col("pass_dup")).as("pos"))
      .join(operators.CorpusQueries.classifierScores(d)
        .select(col("doc_id"), col("lg_micro")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("lg_micro"),
        r.getAs[Boolean]("pos")))
    val out = q("q226_auc_rank").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("w2"), r.getAs[Double]("auc"))).toMap
    val bySrc = scored.groupBy(_._1)
    assert(out.keySet == bySrc.filter { case (_, xs) =>
      xs.exists(_._3) && xs.exists(!_._3) }.keySet)
    for ((src, xs) <- bySrc if out.contains(src)) {
      val pos = xs.filter(_._3).map(_._2)
      val neg = xs.filterNot(_._3).map(_._2)
      val w2 = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(out(src)._1 == w2, s"$src: w2 vs brute force")
      val den = 2L * pos.length * neg.length
      val ppm = (2 * w2 * 1000000L + den) / (2 * den)
      assert(math.abs(out(src)._2 - ppm / 1e6) < 1e-12, s"$src: auc grid")
    }
  }

  test("q227: mass conserves, bins bound the confidence, gap is the ppm |diff|") {
    val rows = q("q227_calibration_ece").collect()
    val docs = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs,
      "every doc lands in exactly one calibration bin")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9)
      val conf = math.round(r.getAs[Double]("mean_conf") * 1e6)
      val acc = math.round(r.getAs[Double]("frac_pos") * 1e6)
      val gap = math.round(r.getAs[Double]("gap") * 1e6)
      assert(gap == math.abs(conf - acc), "gap must be the ppm difference")
      // mean confidence lies in its bin (top bin closed at 1e6)
      assert(conf >= bin * 100000 && conf <= (bin + 1) * 100000,
        s"bin $bin holds conf $conf")
      assert(acc >= 0 && acc <= 1000000)
    }
  }

  test("q228: planted homogeneous class is disclosed; a class at the corpus mix scores t=0") {
    val ss = spark; import ss.implicits._
    import operators.GovernanceQueries.lDiversityAudit
    // frame 1: every class mixes X:Y 1:1 == the corpus mix -> t = 0
    // everywhere, min_l = 2, nothing disclosed
    val uniform = Seq(
      (0, 0L, "X"), (0, 0L, "Y"), (0, 1L, "X"), (0, 1L, "Y"),
      (1, 0L, "X"), (1, 0L, "Y")).toDF("nat", "band", "seg")
    lDiversityAudit(uniform).collect().foreach { r =>
      assert(r.getAs[Long]("min_l") == 2)
      assert(r.getAs[Long]("homogeneous_classes") == 0)
      assert(r.getAs[Double]("max_tvd") == 0.0,
        "class mix == corpus mix must score exactly t = 0")
      assert(r.getAs[Double]("disclosure_risk") == 0.0)
    }
    // frame 2 (hand-computed): class (0,0) = {X,X} homogeneous, class
    // (0,1) = {X,Y}; corpus = 3X 1Y -> both classes at TVD 1/4
    val skewed = Seq(
      (0, 0L, "X"), (0, 0L, "X"), (0, 1L, "X"), (0, 1L, "Y"))
      .toDF("nat", "band", "seg")
    val r = lDiversityAudit(skewed).collect().head
    assert(r.getAs[Long]("n_classes") == 2 && r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Long]("min_l") == 1)
    assert(r.getAs[Long]("homogeneous_classes") == 1)
    assert(r.getAs[Long]("rows_disclosed") == 2)
    assert(r.getAs[Double]("max_tvd") == 0.25)
    assert(r.getAs[Double]("disclosure_risk") == 0.5)
  }

  test("q228: equivalence classes partition the customer table") {
    val rows = q("q228_l_diversity").collect()
    val total = Tables(spark, dir, "customer").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_l") >= 1)
      assert(r.getAs[Long]("rows_disclosed") >= r.getAs[Long]("homogeneous_classes"),
        "each homogeneous class exposes at least one row")
      val t = r.getAs[Double]("max_tvd")
      assert(t >= 0.0 && t <= 1.0)
    }
  }

  test("q229 skyline: planted dominance — dominated out, coordinate ties kept, frontier monotone") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.paretoFrontier
    // (doc, score, toks): 3 is dominated by 2 (9>8, 4<6); 5 by 2
    // (9>7, 4<=4, one strict); 7 by 1 (same score 10, more toks); 2
    // and 4 tie on BOTH coordinates -> mutually non-dominating, both
    // kept; 6 survives on the cheap flank (3 < every better score's
    // min-toks).
    val got = paretoFrontier(Seq(
        (1L, 10L, 5L), (2L, 9L, 4L), (3L, 8L, 6L), (4L, 9L, 4L),
        (5L, 7L, 4L), (6L, 6L, 3L), (7L, 10L, 7L))
        .toDF("doc_id", "lg_micro", "n_toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, 5L), (2L, 9L, 4L), (4L, 9L, 4L),
      (6L, 6L, 3L)))
    // the surviving (score, toks) set is strictly monotone: score desc
    // => toks strictly desc — the skyline invariant q229's comment claims
    val front = got.map(t => (t._2, t._3)).distinct.sortBy(-_._1)
    front.sliding(2).foreach { case Seq((s1, t1), (s2, t2)) =>
      assert(s1 > s2 && t1 > t2, s"non-monotone: ($s1,$t1) ($s2,$t2)")
    case _ => ()
    }
  }

  test("q232 keywords: planted tf/df table — exact lifts, rank order, term tie-break") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.distinctiveTerms
    // A: x tf=3 df=2 -> 1.5; z tf=1 df=1 -> 1.0; y tf=1 df=2 -> 0.5.
    // B: y tf=2 df=2 -> 1.0. C: m and n tie at 1.0 -> term asc.
    val got = distinctiveTerms(Seq(
        ("A", 1L, "x x y"), ("A", 2L, "x z"), ("B", 3L, "y y"),
        ("C", 4L, "m n")).toDF("source", "doc_id", "text"))
      .orderBy(col("source"), col("rnk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("A", 1L, "x", 3L, 2L, 1.5), ("A", 2L, "z", 1L, 1L, 1.0),
      ("A", 3L, "y", 1L, 2L, 0.5), ("B", 1L, "y", 2L, 2L, 1.0),
      ("C", 1L, "m", 1L, 1L, 1.0), ("C", 2L, "n", 1L, 1L, 1.0)))
  }

  test("q233 source distance: identical mixes 0, disjoint 2.0, hand case to the last ppm") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.sourceDistance
    // s1 = s3 = {x:2, y:1}; s2 = {x:1, z:1}; s4 = {p:1, q:1}.
    // (s1,s2): shared x -> 1/42 = 23810ppm, y-only 1/3 -> 333333,
    // z-only 1/2 -> 500000 => 0.857143. Identical pair -> 0 exactly.
    // Disjoint pairs -> p-masses sum to exactly 2.0 on the grid here.
    val got = sourceDistance(Seq(
        ("s1", "x x y"), ("s2", "x z"), ("s3", "x x y"), ("s4", "p q"))
        .toDF("source", "text"))
      .orderBy(col("src_a"), col("src_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("s1", "s2", 1L, 0.857143), ("s1", "s3", 2L, 0.0),
      ("s1", "s4", 0L, 2.0), ("s2", "s3", 1L, 0.857143),
      ("s2", "s4", 0L, 2.0), ("s3", "s4", 0L, 2.0)))
  }

  test("q233 source distance is scale-invariant: doubling a source's corpus moves nothing") {
    // The metric must compare DISTRIBUTIONS, not volumes: every
    // per-term ratio is degree-0 homogeneous in (ca, na) — doubling
    // all of a source's counts multiplies num and den by exactly 4 —
    // so even the ppm ROUNDING is identical, not just close. This is
    // what makes the matrix meaningful across sources of wildly
    // different sizes (the 100 TB reality).
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.sourceDistance
    val base = sourceDistance(Seq(
        ("a", "x x y"), ("b", "x z")).toDF("source", "text"))
      .collect().head.getDouble(3)
    val doubled = sourceDistance(Seq(
        ("a", "x x y x x y"), ("b", "x z")).toDF("source", "text"))
      .collect().head.getDouble(3)
    assert(base == doubled, s"$base != $doubled")
    assert(base == 0.857143)
  }

  test("q238 kappa: closed-form contingencies — 1.0, chance 0.0, -1.0, both-constant NULL") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.judgeAgreement
    def run(rows: (Long, String, Boolean, Boolean)*) = judgeAgreement(
      rows.toSeq.map(r => (r._1, r._2, r._3)).toDF("doc_id", "source", "ja"),
      rows.toSeq.map(r => (r._1, r._4)).toDF("doc_id", "jb"))
      .collect().head
    // perfect agreement -> kappa exactly 1
    assert(run((1L, "s", true, true), (2L, "s", false, false))
      .getDouble(7) == 1.0)
    // one judge constant -> chance-corrected to exactly 0 (raw
    // agreement would read an inflated 0.5)
    val const = run((1L, "s", true, true), (2L, "s", false, true))
    assert(const.getDouble(6) == 0.5 && const.getDouble(7) == 0.0)
    // perfect disagreement -> exactly -1
    assert(run((1L, "s", true, false), (2L, "s", false, true))
      .getDouble(7) == -1.0)
    // BOTH judges constant: pe = 1, kappa undefined -> NULL, not 0
    assert(run((1L, "s", true, true), (2L, "s", true, true)).isNullAt(7))
  }

  test("q235 unseen mass: hapax-only 1.0, no-hapax 0.0, hand case on the ppm half-grid") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.unseenMass
    // a: {x:2, y:1, z:1} -> N1/N = 2/4, and 500000.5 ppm rounds half-up
    // to 500000 (truncating DIV on the doubled numerator). b: {w:2} ->
    // 0 exactly. c: {p,q,r all hapax} -> 1000000.5 -> 1.0 exactly.
    val got = unseenMass(Seq(
        ("a", "x x y z"), ("b", "w w"), ("c", "p q r"))
        .toDF("source", "text"))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("a", 4L, 3L, 2L, 1L, 0.5), ("b", 2L, 1L, 0L, 1L, 0.0),
      ("c", 3L, 3L, 3L, 0L, 1.0)))
  }

  test("q236 lang confusion: planted mislabel lands in the off-diagonal cell with exact share") {
    val ss = spark; import ss.implicits._
    import operators.GovernanceQueries.langConfusion
    // the second 'en' doc is German by markers (der/ist beat the
    // English stopwords) -> cell (en, de) with share 1/2; the true
    // 'de' doc stays diagonal with share 1.
    val got = langConfusion(Seq(
        ("en", "the cat"), ("en", "der hund ist gut"), ("de", "der der"))
        .toDF("lang", "text"))
      .orderBy(col("lang"), col("guess")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("de", "de", 1L, 1L, 1.0),
      ("en", "de", 1L, 2L, 0.5), ("en", "en", 1L, 2L, 0.5)))
  }

  test("q237 curriculum: planted bands — strict source interleave, unique slots, band order") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.curriculumSchedule
    // band 1 has sources a (docs 1, 3) and b (doc 2): S = 2, a idx 1,
    // b idx 2 -> slots a:0,2 b:1 — the round-robin a,b,a. band 0 is a
    // singleton source z.
    val got = curriculumSchedule(Seq(
        (1L, "a", 1L), (3L, "a", 1L), (2L, "b", 1L), (9L, "z", 0L))
        .toDF("doc_id", "source", "band"))
      .orderBy(col("band").desc, col("slot")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, "a", 1L, 0L), (2L, "b", 1L, 1L), (3L, "a", 1L, 2L),
      (9L, "z", 0L, 0L)))
    // RAGGED sources: slots stay UNIQUE (the schedule is a total order
    // under (band DESC, slot)) but are NOT contiguous — once a small
    // source exhausts, its round-robin positions go unused (a:4 docs,
    // b:1 -> a at 0,2,4,6 and b at 1; 3 and 5 are gaps by design).
    // The alternating PREFIX is the diversity property that holds.
    val ragged = curriculumSchedule(Seq(
        (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 1L), (4L, "a", 1L),
        (5L, "b", 1L)).toDF("doc_id", "source", "band"))
      .orderBy(col("slot")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(ragged == Seq((1L, "a", 0L), (5L, "b", 1L), (2L, "a", 2L),
      (3L, "a", 4L), (4L, "a", 6L)))
    assert(ragged.map(_._3).distinct.size == ragged.size, "slots unique")
  }

  test("q239 leakage matrix: unordered pair canonicalization, cross flag, per-cell max") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.crossSourceDups
    // pair (1,2) straddles a/b -> canonical (a, b), cross; pairs (1,3)
    // and (3,4) stay inside a -> one (a, a) cell with max jac 0.8
    val got = crossSourceDups(
      Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (3L, 4L, 0.6))
        .toDF("doc_a", "doc_b", "jac"),
      Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "a"))
        .toDF("doc_id", "source"))
      .orderBy(col("src_a"), col("src_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      ("a", "a", 2L, 0.8, false), ("a", "b", 1L, 0.9, true)))
  }

  test("q241 KS: identical halves 0, disjoint supports 1, hand case exactly 0.5") {
    val ss = spark; import ss.implicits._
    import operators.CorpusQueries.ksDrift
    def ks(rows: (String, Boolean, Long)*) =
      ksDrift(rows.toSeq.toDF("source", "ev", "len"))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ks(("s", true, 5L), ("s", false, 5L), ("s", true, 9L),
      ("s", false, 9L))("s") == 0.0)
    assert(ks(("s", true, 1L), ("s", false, 100L))("s") == 1.0)
    // evens at {1, 3}, odds at {2}: F diffs are 1/2, 1/2, 0 -> D = 0.5
    assert(ks(("s", true, 1L), ("s", true, 3L), ("s", false, 2L))("s")
      == 0.5)
    // a source with an empty half is excluded (KS undefined there)
    assert(!ks(("t", true, 1L), ("t", true, 2L)).contains("t"))
  }

  test("q279: released cells clear the threshold; release is bounded by the capped census and deterministic") {
    import operators.GovernanceQueries.{DpCellCap, DpNoiseB, DpReleaseTau}
    // sf0.01: the release threshold is an ABSOLUTE policy constant, and
    // sf0.01 (the driver's gate scale) is where it splits the grid —
    // at sf0.001 every cell is suppressed (release is empty, still
    // deterministic), at sf0.1 every cell clears it.
    val d = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q279_dp_event_release")(spark, d)
      .collect()
    assert(out.nonEmpty, "some cells must clear the threshold at spec scale")
    // exact capped census, independently recomputed
    val capped = Tables.events(spark, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"), col("event_type"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"), col("hr"))
      .agg(sum(least(col("c"), lit(DpCellCap))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for (r <- out) {
      val key = (r.getString(0), r.getLong(1))
      val released = r.getLong(r.fieldIndex("released"))
      assert(released >= DpReleaseTau.toLong)
      // the release never strays more than the noise bound from the
      // true capped count — the mechanism's accuracy contract
      assert(math.abs(released - capped(key)) <= DpNoiseB.toLong)
    }
    // suppression must actually fire: some true cells are absent
    assert(out.length < capped.size,
      "at spec scale some cells must be suppressed")
    // deterministic replay (seeded noise): an identical second run
    val again = SparkEntry.queries("q279_dp_event_release")(spark, d)
      .collect()
    assert(out.toSeq == again.toSeq)
  }
}
