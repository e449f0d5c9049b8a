package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-analytics operators over the `events` stream table: conversion
  * funnel, cohort retention, moving averages, and gap-filled time series —
  * the interactive-analytics surface of the engine family the reference
  * feeds (its JSONL output is ingestion input for exactly these query
  * shapes). Each is aggregation-first: the event log reduces to per-user
  * or per-day rows before any join or window, so shuffle volume is
  * bounded by |users| or |days|, never by |events|.
  */
object EventAnalytics extends QueryModule {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- conversion funnel: users -> users who clicked -> users who
    // purchased AFTER their first click. Two aggregations and one
    // users-sized join; the event log is never self-joined.
    "q69_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
      val u = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "click", col("ts"))).as("first_click"))
      val conv = ev.join(u, Seq("user_id"))
        .filter(col("event_type") === "purchase" && col("ts") > col("first_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase"))
      u.agg(count(lit(1)).as("n_users"),
          count(col("first_click")).as("n_clicked"))
        .crossJoin(conv.agg(count(lit(1)).as("n_converted")))
        .withColumn("conv_rate",
          round(col("n_converted").cast("double") / col("n_clicked"), 4))
    }),

    // --- Z-order clustering key (the Delta/Iceberg Z-ORDER layout sort,
    // via the codegen'd [[graft.functions.ZorderKey]] Expression): Morton
    // interleave of (user_id, day) so row-group min/max stats prune point
    // filters on EITHER column after the write — ScaleSpec measures the
    // actual pruning on real parquet footers; this gate row pins the key
    // arithmetic cross-engine (the oracle recomputes the interleave as a
    // 32-term bit sum). The orderBy IS the operator: the one range
    // exchange + sort a layout rewrite pays before its write at 100 TB.
    "q149_zorder_layout" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // zorder_key
      events(s, dir)
        .select(col("event_id"), col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day_num"))
        .withColumn("zkey", expr("zorder_key(user_id, day_num)"))
        .orderBy(col("zkey"), col("event_id"))
    }),

    // --- cohort retention: cohort = first active day; day-1 and day-7
    // retention per cohort. The log reduces to distinct (user, day)
    // first, so everything downstream is bounded by users x active-days.
    "q70_retention" -> ((s, dir) => {
      val act = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = act.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      act.join(cohort, Seq("user_id"))
        .groupBy(col("d0"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("day") === date_add(col("d0"), 1), col("user_id")))
            .as("n_day1"),
          countDistinct(when(col("day") === date_add(col("d0"), 7), col("user_id")))
            .as("n_day7"))
        .orderBy(col("d0"))
    }),

    // --- 7-day moving average of daily event counts: RANGE window over
    // days-since-epoch so holes in the calendar do NOT shrink the window
    // to fewer calendar days (ROWS would). Window input is |days| rows.
    "q71_moving_avg" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
      val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
      daily
        .withColumn("ma7", round(sum(col("n")).over(w).cast("double") /
          count(col("n")).over(w), 4))
        .select(col("day"), col("n"), col("ma7"))
        .orderBy(col("day"))
    }),

    // --- rolling 7-day active users (the engagement-metrics shape):
    // exact distinct users per trailing window via a bounded range join
    // of the day axis against distinct (user, day) — candidate volume is
    // |days| x |daily actives|, never |events|², and the event log is
    // reduced to distinct (user, day) before the join.
    "q77_rolling_actives" -> ((s, dir) => {
      val act = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val axis = act.select(col("day").as("as_of")).distinct()
      axis.join(act,
          col("day") >= date_sub(col("as_of"), 6) && col("day") <= col("as_of"))
        .groupBy(col("as_of"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy(col("as_of"))
    }),

    // --- gap-filled daily series (the make-series shape): materialize
    // every calendar day between min and max, left-join the daily counts,
    // zero-fill. The generated axis is |days| rows from one tiny agg.
    "q72_make_series" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val axis = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("day"))
      axis.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("day"))
    }),

    // --- sessionization: split each user's event stream into sessions at
    // >30-minute gaps — boundary flag via lag, session index via running
    // sum over the same window, then per-session aggregates. One shuffle
    // (partition by user for the window); the follow-up groupBy partial-
    // aggregates down to session rows before its exchange. At 100 TB the
    // parallelism unit is users (users >> cores) and a hyperactive user
    // costs only their own event count — never a corpus-wide sort.
    "q83_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("us"))
        .withColumn("nb",
          when(col("us") - lag(col("us"), 1).over(byUser) <= 1800000000L, 0L)
            .otherwise(1L))
        .withColumn("session_idx", sum(col("nb")).over(run))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // --- series anomaly flags (the series_decompose_anomalies shape,
    // z-score flavor): reduce the log to the daily series, compute the
    // series' own mean/stddev as a one-row broadcast, flag days whose
    // count sits more than one sample-stddev out. Everything after the
    // first partial-aggregated groupBy runs on |days| rows, so the shape
    // is free at any event volume; the stats join is a broadcast
    // nest-loop of exactly one row.
    "q96_series_outliers" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val st = daily.agg(
        avg(col("n").cast("double")).as("mu"),
        stddev_samp(col("n").cast("double")).as("sd"))
      daily.crossJoin(st)
        .select(col("day"), col("n"),
          round((col("n") - col("mu")) / col("sd"), 4).as("z"),
          (abs(col("n") - col("mu")) > col("sd")).as("is_outlier"))
        .orderBy(col("day"))
    }),

    // --- 7-day moving MEDIAN (robust sibling of q71's moving average:
    // one anomalous day cannot drag it). percentile() runs as a window
    // aggregate over the post-agg daily frame — |days| rows, so the
    // exact in-window sort is free; the event log itself only ever sees
    // the partial-aggregated groupBy. Interpolated median of integer
    // counts is exact in double on both engines.
    "q102_window_median" -> ((s, dir) => {
      val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
      events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("med7", percentile(col("n"), lit(0.5)).over(w))
        .orderBy(col("day"))
    }),

    // --- linearly interpolated series fill (series_fill_linear): where
    // q72 zero-fills calendar gaps, this interpolates them from the
    // nearest real observations on each side. Gaps are carved
    // deterministically (every 5th day of month dropped) so the
    // interpolation path actually executes. Two ignore-nulls window
    // passes over the |days|-sized frame give (prev value, prev day) and
    // (next value, next day); the lerp is pure arithmetic. The windows
    // run on the tiny post-agg series, never the event log — at 100 TB
    // the series would be per-key (partitionBy(series_id)) with identical
    // mechanics.
    "q98_series_fill_linear" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(38, 6)))
          .cast("double").as("v"))
        .filter(dayofmonth(col("day")) % 5 =!= 0)
      val axis = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("day"))
      val series = axis.join(daily, Seq("day"), "left")
      val before = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val after = Window.orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      series
        .withColumn("vp", last(col("v"), ignoreNulls = true).over(before))
        .withColumn("dp", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(before))
        .withColumn("vn", first(col("v"), ignoreNulls = true).over(after))
        .withColumn("dn", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(after))
        .select(col("day"), col("v").isNull.as("filled"),
          round(coalesce(col("v"),
            col("vp") + (col("vn") - col("vp")) *
              datediff(col("day"), col("dp")).cast("double") /
              datediff(col("dn"), col("dp")).cast("double")), 4).as("v"))
        .orderBy(col("day"))
    }),

    // --- per-series least-squares trend: the slope of each user's value
    // series over time — the fleet-wide "is this metric drifting" fit a
    // monitoring pipeline runs per entity. ONE pass: OLS needs only the
    // moment sums (n, Σx, Σy, Σxy, Σx²), all exact integers here — x is
    // whole seconds from a fixed 2024-01-01 origin (pinning the origin
    // keeps x² small enough for exact DECIMAL sums at any row count; a
    // naive epoch-micros x would overflow even HUGEINT at Σx²), y is the
    // repo's DECIMAL(38,6) micro-units convention. The slope is signed,
    // and signed integer division DIVERGES between engines (Spark DIV
    // truncates toward zero; DuckDB //'s negative behavior is
    // version-dependent — the shipped 1.0.0 truncates too, other
    // releases floor, probed r14), so the half-up grid
    // division runs on |numerator| with the sign reapplied — the one
    // subtlety the positive-only grid rule never hits. Map-side partial
    // agg; the only exchange carries one row per user.
    "q159_user_trend" -> ((s, dir) => userTrend(events(s, dir))),

    // --- first-order Markov transition matrix of user behavior: counts
    // and probabilities of event_type bigrams along each user's
    // time-ordered stream — the session/journey model behind next-action
    // prediction and funnel-anomaly alerts. The lag window is
    // partitioned by user (the q83 sessionize shape: per-partition state
    // is one user's stream, never global), ordered by the total
    // (ts, event_id) key so ties cannot reorder between engines;
    // transition counts then partial-aggregate map-side into an
    // alphabet²-bounded exchange (25 rows here — bounded by the type
    // alphabet at ANY corpus size). p lands on the half-up 1e-6 integer
    // grid per source state, never round(n/total).
    "q177_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pw = Window.partitionBy(col("prev_type"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next_type"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        // row-total per source state: a window over the 25-row aggregate,
        // not the event stream — alphabet-bounded, cost-free
        .withColumn("tot", sum(col("n")).over(pw))
        .withColumn("pm", // gridDiv: the one overflow-safe micro grid
          expr(GovernanceQueries.gridDiv("n", "tot")))
        .select(col("prev_type"), col("next_type"), col("n"),
          (col("pm").cast("double") / lit(1000000.0)).as("p"))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // --- SCD2 history reconstruction + point-in-time snapshot (q181):
    // the change-data-capture shape every lakehouse dimension table
    // needs — each event opens a version of its user's state
    // [ts, lead(ts)), the open version is current, and a snapshot query
    // answers "who was in state X at time T". The lead window is
    // partitioned by user and ordered by the total (ts, event_id) key
    // (the q177 discipline: per-partition state is one user's stream,
    // ties cannot reorder between engines), the snapshot filter is a
    // map-side interval test, and the output exchange is
    // alphabet-bounded. Dwell averages live on the half-up micro grid
    // over exact integer micro sums (DECIMAL(38,0): a month of micros
    // times 1e12 versions overflows long).
    "q181_scd2_snapshot" -> ((s, dir) =>
      scd2Snapshot(events(s, dir), "2024-01-15 00:00:00")),

    // --- last-touch attribution (q189): assign every purchase to the
    // user's most recent click within a 7-day lookback — the marketing
    // attribution shape, and the only windowed form that scales: a
    // running conditional last (IGNORE NULLS) over each user's
    // (ts, event_id)-ordered stream, so no purchases×clicks self-join
    // ever forms (the naive as-of join shuffles the click table once
    // per purchase; this is one pass). Daily rollup exchange is
    // days-bounded; latency averages on the half-up micro grid in
    // DECIMAL(38,0).
    "q189_last_touch" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .withColumn("last_click_us",
          last(when(col("event_type") === "click", unix_micros(col("ts"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("lat_us", unix_micros(col("ts")) - col("last_click_us"))
        .withColumn("attributed",
          col("last_click_us").isNotNull &&
            col("lat_us") <= lit(7L * 86400L * 1000000L))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
          sum(when(col("attributed"), col("lat_us"))
            .cast(DecimalType(38, 0))).as("sum_lat"))
        .withColumn("avg_latency_s",
          when(col("n_attributed") === 0, lit(0.0)).otherwise(
            expr("(2 * sum_lat + n_attributed) DIV (2 * n_attributed)")
              .cast("double") / lit(1000000.0)))
        .select(col("day"), col("n_purchases"), col("n_attributed"),
          col("avg_latency_s"))
        .orderBy(col("day"))
    }),

    // --- shuffle-key skew audit (q183): the diagnostic a pipeline runs
    // BEFORE keying a 100 TB shuffle on a column — top-key shares say
    // whether one key dominates (salt it), and the 32-bucket hash
    // histogram says how the engine's own hash partitioner would load
    // executors (imbalance 1e6 = perfectly even). Both passes are
    // map-side partial aggs: the exchange carries |keys| rows for the
    // share pass (top-10 via TakeOrderedAndProject, never a global
    // sort) and exactly 32 rows for the bucket pass. All ratios on the
    // half-up 1e-6 grid in DECIMAL(38,0).
    "q183_skew_audit" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // fnv64
      val ev = events(s, dir)
      val perKey = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val top = perKey.orderBy(col("n").desc, col("user_id")).limit(10)
        .agg(max(col("n")).as("top1_n"), sum(col("n")).as("top10_n"))
      // n_rows folds into the keys aggregate (r14 review): a separate
      // ev.agg(count) was a third full scan of the largest table
      val keys = perKey.agg(count(lit(1)).as("n_keys"),
        sum(col("n")).cast("long").as("n_rows"))
      val buckets = ev
        .select(pmod(expr("fnv64(CAST(user_id AS STRING))"), lit(32L)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("bn"))
        .agg(max(col("bn")).as("max_bucket"))
      keys.crossJoin(top).crossJoin(buckets)
        .withColumn("top1_ppm",
          expr(s"CAST(${GovernanceQueries.gridDiv("top1_n", "n_rows")} AS BIGINT)"))
        .withColumn("top10_ppm",
          expr(s"CAST(${GovernanceQueries.gridDiv("top10_n", "n_rows")} AS BIGINT)"))
        .withColumn("imbalance_ppm",
          expr(s"CAST(${GovernanceQueries.gridDiv("max_bucket * 32", "n_rows")} AS BIGINT)"))
        .select(col("n_rows"), col("n_keys"), col("top1_ppm"),
          col("top10_ppm"), col("imbalance_ppm"))
    }),

    // --- NDCG@5 ranking eval (q222): how well each user's ARRIVAL
    // order ranks their high-value events — the standard graded
    // relevance metric of retrieval eval (Järvelin & Kekäläinen),
    // built engine-exact: the 1/log2(i+1) position discounts are FIXED
    // INTEGER LITERALS on the 1e-6 grid (no runtime log), relevance =
    // floor(value), DCG/IDCG are integer dot products over each user's
    // first 5 events, and the final ratio is one half-up grid
    // division. Two windows per user (arrival rank, ideal rank) over
    // per-user-bounded rows — the q219 per-user-stream shape. IDCG is
    // tie-invariant: equal relevances permute within a discount run
    // without changing the sum.
    "q222_ndcg_eval" -> ((s, dir) => {
      val wArr = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      // rel clamps at 0 (mirrored in the oracle): integer-division
      // semantics on negatives are VERSION-dependent in DuckDB (the
      // shipped 1.0.0's // truncates toward zero exactly like Spark
      // DIV — probed r14 — but the documented floor-division semantic
      // exists in other releases), so the grid DIV below is only
      // portable for nonnegative dcg. The clamp makes the
      // nonnegativity assumption explicit instead of data-dependent
      // (ADVICE r10); standard graded relevance is nonnegative anyway.
      val top5 = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          greatest(floor(col("value")).cast("long"), lit(0L)).as("rel"))
        .withColumn("rn", row_number().over(wArr))
        .filter(col("rn") <= 5)
      val discount = "CASE %s WHEN 1 THEN 1000000 WHEN 2 THEN 630930 " +
        "WHEN 3 THEN 500000 WHEN 4 THEN 430677 ELSE 386853 END"
      val ranked = top5.withColumn("irn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("rel").desc, col("rn").asc)))
      ranked.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ranked"),
          // decimal BEFORE the discount multiply (r14 review): an
          // extreme rel (floor of an unbounded double) could wrap the
          // long product where the oracle's HUGEINT is exact
          sum(expr("CAST(rel AS DECIMAL(38,0)) * " + discount.format("rn")))
            .cast("long").as("dcg"),
          sum(expr("CAST(rel AS DECIMAL(38,0)) * " + discount.format("irn")))
            .cast("long").as("idcg"))
        .withColumn("ndcg", expr(
          s"""CASE WHEN idcg = 0 THEN CAST(1000000 AS BIGINT)
            |ELSE CAST(${GovernanceQueries.gridDiv("dcg", "idcg")} AS BIGINT) END"""
            .stripMargin).cast("double") / 1e6)
        .select(col("user_id"), col("n_ranked"), col("dcg"), col("idcg"),
          col("ndcg"))
        .orderBy(col("user_id"))
    })
  )

  /** q181's engine, factored so unit tests can drive planted streams:
    * see the q181 entry comment for the interval and grid contract.
    * Expects (user_id, ts, event_id, event_type). */
  private[graft] def scd2Snapshot(ev: DataFrame, snapTs: String): DataFrame = {
    val snapT = lit(snapTs).cast("timestamp")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val v = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
    val atT = v
      .filter(col("ts") <= snapT &&
        (col("valid_to").isNull || col("valid_to") > snapT))
      .groupBy(col("state")).agg(count(lit(1)).as("n_users_at_t"))
    v.groupBy(col("state")).agg(
        count(lit(1)).as("n_versions"),
        sum(when(col("valid_to").isNotNull,
          unix_micros(col("valid_to")) - unix_micros(col("ts")))
          .cast(DecimalType(38, 0))).as("sum_us"),
        sum(when(col("valid_to").isNotNull, 1L).otherwise(0L)).as("n_closed"))
      .join(atT, Seq("state"), "left")
      .withColumn("n_users_at_t", coalesce(col("n_users_at_t"), lit(0L)))
      .withColumn("avg_dwell_s",
        when(col("n_closed") === 0, lit(0.0)).otherwise(
          expr("(2 * sum_us + n_closed) DIV (2 * n_closed)")
            .cast("double") / lit(1000000.0)))
      .select(col("state"), col("n_versions"), col("n_users_at_t"),
        col("avg_dwell_s"))
      .orderBy(col("state"))
  }

  /** q159's engine, factored so unit tests can drive planted series:
    * see the q159 entry comment for the arithmetic contract. */
  private[graft] def userTrend(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"),
      expr("unix_micros(ts) DIV 1000000 - 1704067200").as("x"),
      (col("value").cast(DecimalType(38, 6)) * 1000000)
        .cast("long").as("ym"))
    e.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).as("sx"),
        sum(col("ym").cast(DecimalType(38, 0))).as("sy"),
        // cast BEFORE the multiply (r14 review): x*ym in LongType
        // wraps at ~9.2e18 (value 1e7 a month after the origin) ahead
        // of the decimal sum — the oracle multiplies in HUGEINT
        sum(col("x").cast(DecimalType(38, 0)) *
          col("ym").cast(DecimalType(38, 0))).as("sxy"),
        sum(col("x").cast(DecimalType(38, 0)) *
          col("x").cast(DecimalType(38, 0))).as("sxx"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("user_id"), col("n"),
        // mean in y units on the 1e-6 grid (sy is already micro-y);
        // sign-reapplied like the slope in case of negative values
        (expr("CASE WHEN sy < 0 THEN -1 ELSE 1 END" +
          " * ((2 * abs(sy) + n) DIV (2 * n))")
          .cast("double") / lit(1000000.0)).as("mean_value"),
        // slope in y units per DAY: num/den is micro-y per second
        when(col("den") === 0, lit(0.0)).otherwise(
          (expr("CASE WHEN num < 0 THEN -1 ELSE 1 END" +
            " * ((2 * abs(num) * 86400 + den) DIV (2 * den))")
            .cast("double") / lit(1000000.0))).as("slope_per_day"))
      .orderBy(col("user_id"))
  }

  def oracles: Map[String, String] = Map(
    "q159_user_trend" ->
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS ym
        |  FROM events),
        |a AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(x::HUGEINT) AS sx, SUM(ym::HUGEINT) AS sy,
        |    SUM(x::HUGEINT * ym) AS sxy, SUM(x::HUGEINT * x) AS sxx
        |  FROM e GROUP BY 1),
        |b AS (SELECT *, n * sxy - sx * sy AS num,
        |        n * sxx - sx * sx AS den FROM a)
        |SELECT user_id, n,
        |  (CASE WHEN sy < 0 THEN -1 ELSE 1 END *
        |    ((2 * abs(sy) + n) // (2 * n))) / 1000000.0 AS mean_value,
        |  CASE WHEN den = 0 THEN 0.0 ELSE
        |    (CASE WHEN num < 0 THEN -1 ELSE 1 END *
        |      ((2 * abs(num) * 86400 + den) // (2 * den))) / 1000000.0
        |  END AS slope_per_day
        |FROM b ORDER BY user_id""".stripMargin,
    // Morton interleave as a 32-term bit sum: bit i of user_id lands at
    // 2i, of day_num at 2i+1 (ZorderKey's documented contract). The
    // oracle is TOTAL over that contract's whole domain, not just this
    // data: inputs mask to their low 32 bits exactly like the engine,
    // each bit scales a HUGEINT power of two (a BIGINT shift by 62/63
    // would overflow when bit 31 is set — DuckDB throws where the
    // engine's Long wraps), and the HUGEINT sum wraps mod 2^64 into the
    // same signed Long two's-complement value ZorderKey produces.
    "q149_zorder_layout" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day_num
        |  FROM events),
        |bits AS (SELECT CAST(unnest(range(32)) AS BIGINT) AS i),
        |z AS (SELECT e.event_id, e.user_id, e.day_num,
        |    sum((((e.user_id & 4294967295) >> i) & 1) *
        |          (CAST(1 AS HUGEINT) << (2 * i)) +
        |        (((e.day_num & 4294967295) >> i) & 1) *
        |          (CAST(1 AS HUGEINT) << (2 * i + 1))) AS s
        |  FROM e CROSS JOIN bits
        |  GROUP BY e.event_id, e.user_id, e.day_num)
        |SELECT event_id, user_id, day_num,
        |  CAST(CASE WHEN s >= CAST(9223372036854775808 AS HUGEINT)
        |    THEN s - CAST(18446744073709551616 AS HUGEINT) ELSE s END
        |    AS BIGINT) AS zkey
        |FROM z
        |ORDER BY zkey, event_id""".stripMargin,

    "q102_window_median" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |           FROM events GROUP BY 1)
        |SELECT day, n, median(n) OVER (ORDER BY day
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM d ORDER BY day""".stripMargin,
    "q98_series_fill_linear" ->
      """WITH d0 AS (SELECT CAST(ts AS DATE) AS day,
        |              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        |            FROM events GROUP BY 1),
        |daily AS (SELECT * FROM d0 WHERE EXTRACT(DAY FROM day) % 5 <> 0),
        |axis AS (SELECT CAST(unnest(generate_series(
        |           (SELECT MIN(day) FROM daily), (SELECT MAX(day) FROM daily),
        |           INTERVAL 1 DAY)) AS DATE) AS day),
        |s AS (SELECT a.day, d.v FROM axis a LEFT JOIN daily d USING (day)),
        |w AS (SELECT day, v,
        |  LAST_VALUE(v IGNORE NULLS) OVER
        |    (ORDER BY day ROWS UNBOUNDED PRECEDING) AS vp,
        |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
        |    (ORDER BY day ROWS UNBOUNDED PRECEDING) AS dp,
        |  FIRST_VALUE(v IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
        |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
        |  FROM s)
        |SELECT day, (v IS NULL) AS filled,
        |  round(COALESCE(v, vp + (vn - vp) * CAST(day - dp AS DOUBLE)
        |    / CAST(dn - dp AS DOUBLE)), 4) AS v
        |FROM w ORDER BY day""".stripMargin,
    "q96_series_outliers" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |           FROM events GROUP BY 1),
        |st AS (SELECT AVG(CAST(n AS DOUBLE)) AS mu,
        |              STDDEV_SAMP(CAST(n AS DOUBLE)) AS sd FROM d)
        |SELECT day, n, round((n - mu) / sd, 4) AS z,
        |       (abs(n - mu) > sd) AS is_outlier
        |FROM d, st ORDER BY day""".stripMargin,
    "q69_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click
        |  FROM events GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, min(e.ts) AS first_purchase
        |  FROM events e JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > u.first_click
        |  GROUP BY 1)
        |SELECT a.n_users, a.n_clicked, b.n_converted,
        |  round(CAST(b.n_converted AS DOUBLE) / a.n_clicked, 4) AS conv_rate
        |FROM (SELECT COUNT(*) AS n_users, COUNT(first_click) AS n_clicked FROM u) a
        |CROSS JOIN (SELECT COUNT(*) AS n_converted FROM conv) b""".stripMargin,
    "q70_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY 1)
        |SELECT c.d0, COUNT(DISTINCT a.user_id) AS n_users,
        |  COUNT(DISTINCT CASE WHEN a.day = c.d0 + 1 THEN a.user_id END) AS n_day1,
        |  COUNT(DISTINCT CASE WHEN a.day = c.d0 + 7 THEN a.user_id END) AS n_day7
        |FROM act a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY c.d0 ORDER BY c.d0""".stripMargin,
    "q77_rolling_actives" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |axis AS (SELECT DISTINCT day AS as_of FROM act)
        |SELECT axis.as_of, COUNT(DISTINCT act.user_id) AS active_7d
        |FROM axis JOIN act
        |  ON act.day >= axis.as_of - 6 AND act.day <= axis.as_of
        |GROUP BY axis.as_of ORDER BY axis.as_of""".stripMargin,
    "q71_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1),
        |d AS (SELECT day, n, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num
        |      FROM daily)
        |SELECT day, n,
        |  round(CAST(SUM(n) OVER w AS DOUBLE) / COUNT(n) OVER w, 4) AS ma7
        |FROM d
        |WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q72_make_series" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1),
        |axis AS (
        |  SELECT CAST(unnest(generate_series(min(day), max(day),
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM daily)
        |SELECT axis.day, COALESCE(daily.n, 0) AS n
        |FROM axis LEFT JOIN daily ON axis.day = daily.day
        |ORDER BY axis.day""".stripMargin,
    "q83_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NOT NULL AND us - prev <= 1800000000
        |         THEN 0 ELSE 1 END AS nb
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM b)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MIN(ts) AS sess_start, MAX(ts) AS sess_end
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The same total (ts, event_id) lag order, counts per type bigram,
    // p on the half-up 1e-6 grid (all terms non-negative, // == DIV).
    "q177_markov_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, COUNT(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT *, SUM(n) OVER (PARTITION BY prev_type) AS tot FROM c)
        |SELECT prev_type, next_type, n,
        |  CAST((2 * n::HUGEINT * 1000000 + tot) // (2 * tot::HUGEINT)
        |    AS BIGINT) / 1000000.0 AS p
        |FROM s ORDER BY prev_type, next_type""".stripMargin,

    // Same lead-window version intervals, snapshot interval test, and
    // half-up micro-grid dwell average.
    "q181_scd2_snapshot" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id, event_type AS state,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS valid_to
        |  FROM events),
        |att AS (
        |  SELECT state, COUNT(*) AS n_users_at_t FROM v
        |  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        |    AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |  GROUP BY state),
        |ag AS (
        |  SELECT state, COUNT(*) AS n_versions,
        |    CAST(SUM(CASE WHEN valid_to IS NOT NULL
        |      THEN epoch_us(valid_to) - epoch_us(ts) END) AS HUGEINT) AS sum_us,
        |    SUM(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END) AS n_closed
        |  FROM v GROUP BY state)
        |SELECT a.state, a.n_versions,
        |  COALESCE(t.n_users_at_t, 0) AS n_users_at_t,
        |  CASE WHEN a.n_closed = 0 THEN 0.0 ELSE
        |    CAST((2 * a.sum_us + a.n_closed) // (2 * a.n_closed) AS DOUBLE)
        |      / 1000000.0 END AS avg_dwell_s
        |FROM ag a LEFT JOIN att t USING (state)
        |ORDER BY a.state""".stripMargin,

    // Per-key counts -> top-10 shares; per-hash-bucket counts on the
    // engine-replicated fnv64 mod 32 -> load imbalance.
    "q183_skew_audit" -> {
      val h = LlmQueries.wrapSigned(
        LlmQueries.fnvSqlOf("CAST(user_id AS VARCHAR)"))
      s"""WITH pk AS (SELECT user_id, COUNT(*) AS n FROM events
         |            GROUP BY user_id),
         |top AS (SELECT MAX(n) AS top1_n, SUM(n) AS top10_n FROM (
         |  SELECT n FROM pk ORDER BY n DESC, user_id LIMIT 10)),
         |bk AS (SELECT MAX(bn) AS max_bucket FROM (
         |  SELECT (($h % 32) + 32) % 32 AS b, COUNT(*) AS bn
         |  FROM events GROUP BY 1)),
         |tot AS (SELECT COUNT(*) AS n_rows FROM events),
         |ks AS (SELECT COUNT(*) AS n_keys FROM pk)
         |SELECT t.n_rows, k.n_keys,
         |  CAST((2 * CAST(p.top1_n AS HUGEINT) * 1000000 + t.n_rows)
         |    // (2 * t.n_rows) AS BIGINT) AS top1_ppm,
         |  CAST((2 * CAST(p.top10_n AS HUGEINT) * 1000000 + t.n_rows)
         |    // (2 * t.n_rows) AS BIGINT) AS top10_ppm,
         |  CAST((2 * CAST(b.max_bucket AS HUGEINT) * 32 * 1000000 + t.n_rows)
         |    // (2 * t.n_rows) AS BIGINT) AS imbalance_ppm
         |FROM tot t, ks k, top p, bk b""".stripMargin
    },

    // Same running conditional last over the total per-user order, same
    // 7-day gate and half-up micro-grid latency average.
    "q189_last_touch" ->
      """WITH a AS (
        |  SELECT ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_click_us
        |  FROM events),
        |p AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    epoch_us(ts) - last_click_us AS lat_us,
        |    (last_click_us IS NOT NULL AND
        |     epoch_us(ts) - last_click_us <= 604800000000) AS attributed
        |  FROM a WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT day, COUNT(*) AS n_purchases,
        |    CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_attributed,
        |    CAST(SUM(CASE WHEN attributed THEN lat_us END) AS HUGEINT)
        |      AS sum_lat
        |  FROM p GROUP BY day)
        |SELECT day, n_purchases, n_attributed,
        |  CASE WHEN n_attributed = 0 THEN 0.0 ELSE
        |    CAST((2 * sum_lat + n_attributed) // (2 * n_attributed)
        |      AS DOUBLE) / 1000000.0 END AS avg_latency_s
        |FROM g ORDER BY day""".stripMargin,

    "q222_ndcg_eval" ->
      """WITH e AS (
        |  SELECT user_id, greatest(CAST(floor(value) AS BIGINT), 0) AS rel,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |t5 AS (SELECT * FROM e WHERE rn <= 5),
        |r AS (
        |  SELECT user_id, rel, rn,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY rel DESC, rn ASC) AS irn
        |  FROM t5),
        |w AS (
        |  SELECT user_id, COUNT(*) AS n_ranked,
        |    CAST(SUM(rel * CASE rn WHEN 1 THEN 1000000 WHEN 2 THEN 630930
        |      WHEN 3 THEN 500000 WHEN 4 THEN 430677 ELSE 386853 END)
        |      AS BIGINT) AS dcg,
        |    CAST(SUM(rel * CASE irn WHEN 1 THEN 1000000 WHEN 2 THEN 630930
        |      WHEN 3 THEN 500000 WHEN 4 THEN 430677 ELSE 386853 END)
        |      AS BIGINT) AS idcg
        |  FROM r GROUP BY 1)
        |SELECT user_id, n_ranked, dcg, idcg,
        |  CAST(CASE WHEN idcg = 0 THEN 1000000
        |    ELSE CAST((2 * dcg::HUGEINT * 1000000 + idcg) //
        |      (2 * idcg::HUGEINT) AS BIGINT) END AS DOUBLE) / 1000000.0
        |    AS ndcg
        |FROM w ORDER BY user_id""".stripMargin
  )
}
