package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join surface (SURVEY §2.2 joins row: "range/as-of joins
  * composed from inequality conds") plus the deterministic dataset-split
  * a training pipeline runs before anything else.
  *
  * The as-of join deliberately avoids a join operator: at scale the naive
  * "equi-join on key then keep latest ≤ t" explodes candidate pairs by the
  * per-key right-side cardinality BEFORE the window prunes them. The
  * union-then-window form shuffles each input row exactly once (one
  * exchange on the key), carries the latest right-side value forward with
  * a running `last(ignoreNulls)`, and never materializes a pair — the
  * same single-pass merge a time-series engine does, expressed in Spark
  * operators (no custom SparkPlan needed).
  */
object TemporalQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- AS-OF join: for every purchase event, the user's most recent
    // click at-or-before it, via the reusable [[TemporalOps.asofJoin]]
    // (union + running-last window, no join operator — PlanSpec asserts).
    // Clicks are pre-deduped per (user, ts) so the tie-break is
    // deterministic on both engines; equal timestamps sort
    // click-before-purchase to get `<=` semantics (DuckDB ASOF parity).
    "q26_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("click_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      TemporalOps.asofJoin(purchases, clicks, "user_id", "ts", "ts")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("asof_click_id"), col("asof_ts").as("asof_click_ts"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // --- RANGE join: (click, purchase) pairs of the same user where the
    // purchase lands within the hour after the click, counted per user.
    // Equality on user_id keeps this a hash/sort-merge join with the range
    // as a residual predicate — per-user row counts bound the pair
    // blow-up; at 100 TB the time axis would additionally be bucketed
    // (join on (user, hour-bucket)) to cap skew.
    "q27_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      clicks.join(purchases, Seq("user_id"))
        .filter(col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("pairs"))
        .orderBy(col("user_id"))
    }),

    // --- deterministic train/valid/test split: hash the content, not the
    // row position, so the split is stable under repartitioning, appends
    // and re-runs — the property a training pipeline actually needs. The
    // last hex digit of md5(text) gives 16 stable buckets: 0 -> test,
    // 1 -> valid, rest -> train. Pure map-side; one tiny final agg.
    "q29_train_split" -> ((s, dir) => {
      val bucket = ascii(substring(md5(col("text")), 32, 1))
      Tables.documents(s, dir)
        .withColumn("split",
          when(bucket === ascii(lit("0")), "test")
            .when(bucket === ascii(lit("1")), "valid")
            .otherwise("train"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(col("split"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q26_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |p AS (
        |  SELECT user_id, event_id, ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.ts,
        |  c.click_id AS asof_click_id, c.ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q27_range_join" ->
      """SELECT c.user_id, COUNT(*) AS pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    "q29_train_split" ->
      """SELECT CASE substr(md5(text), 32, 1)
        |         WHEN '0' THEN 'test' WHEN '1' THEN 'valid' ELSE 'train'
        |       END AS split,
        |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
  )
}
