package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The relational operator surface (SURVEY.md §2.2) the reference engine
  * lacks entirely and the new engine gets from Spark built-ins: filters,
  * projections, joins (inner/outer/semi/anti/broadcast), hash aggregation,
  * rollup, windows, sort/limit/top-k, set ops, scalar functions.
  *
  * Every query is declarative DataFrame API — Catalyst does predicate
  * pushdown, column pruning and join planning; nothing here hand-schedules.
  * Small dimension tables (region/nation/customer at any SF where they fit
  * the 10 MB default, or explicitly here) are broadcast so the fact-table
  * side never shuffles for the join.
  *
  * Float-portability rule: DuckDB (the oracle) and Spark sum doubles in
  * different orders, so any SUM/AVG over a double column goes through an
  * exact DECIMAL(38,6) intermediate and is cast back to DOUBLE — identical
  * bits on both engines regardless of accumulation order. Precision 38 is
  * the max on both engines and leaves ~1e32 of headroom: sums stay exact
  * even at the 100 TB row counts the bench tables stand in for.
  */
object RelationalQueries extends QueryModule {

  /** Exact, order-insensitive sum of a double expression (see class doc). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast(DoubleType)
  private def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation (TPC-H Q1 shaped): scan → filter → hash-agg; partial
    // aggregation (map-side combine) comes free from groupBy().agg().
    "q01_agg_pricing" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- filter + projection: both pushed into the parquet scan by Catalyst
    // (PushedFilters + pruned ReadSchema → only 4 of 11 columns read).
    "q02_filter_project" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
                col("l_shipdate") <  to_timestamp(lit("1995-04-01")) &&
                col("l_quantity") > lit(45.0))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // --- broadcast join: customer is the small build side; the orders scan
    // streams through a BroadcastHashJoin with zero shuffle.
    "q03_join_broadcast" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- multi-way join up the star: region ⋈ nation ⋈ customer ⋈ orders.
    // All dims broadcast; the single fact scan never shuffles.
    "q04_join_multiway" -> ((s, dir) => {
      val r = Tables(s, dir, "region")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // --- top-k: orderBy+limit plans as TakeOrderedAndProject — each
    // partition keeps only k rows, the driver merges k*numPartitions.
    "q05_topk" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // --- window function: per-customer top-3 orders by price.
    "q06_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // --- distinct + count distinct (exact) + approx sanity is tested in
    // ScalaTest, not oracled (HLL++ is engine-specific).
    "q07_distinct" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    }),

    // --- set op: INTERSECT of rich customers with ordering customers.
    "q08_setops" -> ((s, dir) => {
      val rich = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      val ordering = Tables(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"))
      rich.intersect(ordering).orderBy(col("c_custkey"))
    }),

    // --- semi join (EXISTS): customers with at least one order, by nation.
    "q09_semijoin" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    }),

    // --- anti join (NOT EXISTS): orders with no lineitems.
    "q10_antijoin" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // --- rollup: hierarchical subtotals (flag, status) → (flag) → ().
    "q11_rollup" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // --- scalar function surface: string/math functions, all codegen'd
    // builtins (upper/length/substring/floor/abs/modulo/concat).
    "q12_scalar_funcs" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          floor(col("p_retailprice")).as("price_floor"),
          abs(col("p_size") - lit(25)).as("size_dist"),
          (col("p_partkey") % 7).as("pk_mod"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // --- HAVING: group filter after aggregation.
    "q13_having" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .filter(col("n") > 10)
        .orderBy(col("o_orderpriority"))
    }),

    // --- date_trunc bucketing: monthly revenue time series.
    "q14_date_trunc" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("month"))
    }),

    // --- CASE WHEN bucketing.
    "q15_case_expr" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // --- predicate surface: IN-list, BETWEEN, LIKE — all pushed to parquet.
    "q16_pred_surface" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      p.filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
               col("p_size").between(5, 25) &&
               col("p_type").like("%O%"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    // --- left outer join with null-handling (coalesce on the probe side).
    "q17_left_join" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
                coalesce(col("cnt"), lit(0L)).as("n_customers"))
        .orderBy(col("n_nationkey"))
    }),

    // --- correlated-aggregate shape (TPC-H Q17 style): join against a
    // per-group average computed once, not a per-row subquery. The
    // average table has |part| rows — billions at 100 TB — so it is NOT
    // broadcast-hinted: the join shuffles on the part key (both sides
    // already keyed by it) and AQE converts to broadcast at runtime
    // whenever the measured aggregate actually is small.
    "q18_join_on_agg" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") > col("avg_qty") * 1.5)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("l_returnflag"))
    }),

    // --- FULL OUTER join with genuinely unmatched rows on BOTH sides:
    // customers capped at custkey <= 50 vs orders of custkeys > 25, so
    // nulls appear left and right and the null-handling of the join
    // itself (not just left-outer fill) is what gets hashed.
    "q73_full_outer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .filter(col("c_custkey") <= 50)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = Tables(s, dir, "orders")
        .filter(col("o_custkey") > 25)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("o_custkey"), col("n_orders"))
        .orderBy(col("c_custkey").asc_nulls_last, col("o_custkey").asc_nulls_last)
    }),

    // --- explicit CROSS join of two small dimensions (the one join shape
    // that is NEVER acceptable on two large sides; here both are tiny and
    // the product is the point — e.g. building a dense grid).
    "q74_cross_grid" -> ((s, dir) => {
      val r = Tables(s, dir, "region").select(col("r_name"))
      val st = Tables(s, dir, "orders").select(col("o_orderstatus")).distinct()
      r.crossJoin(st)
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    }),

    // --- arg-max/arg-min aggregates (max_by/min_by): which row attains
    // the group's extreme, in ONE hash aggregation — no window, no
    // self-join. Deterministic here because the per-status price extremes
    // are untied in the harness data (verified at gate and bench sf);
    // with tied extremes, compose the tie-break into the ordering value.
    "q78_arg_extremes" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_order"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("o_orderstatus"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1995-04-01'
        |  AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_broadcast" ->
      s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_join_multiway" ->
      s"""SELECT r_name, ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q07_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08_setops" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q09_semijoin" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q10_antijoin" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q11_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, ${dsumSql("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, LENGTH(p_name) AS name_len,
        |  SUBSTRING(p_type, 1, 5) AS type5,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        |  ABS(p_size - 25) AS size_dist, p_partkey % 7 AS pk_mod,
        |  CONCAT_WS('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q13_having" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 10
         |ORDER BY o_orderpriority""".stripMargin,
    "q14_date_trunc" ->
      s"""SELECT DATE_TRUNC('month', o_orderdate) AS month, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q15_case_expr" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 3000 THEN 'low'
        |            WHEN c_acctbal < 7000 THEN 'mid'
        |            ELSE 'high' END AS bucket, COUNT(*) AS n
        |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q16_pred_surface" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
        |  AND p_size BETWEEN 5 AND 25 AND p_type LIKE '%O%'
        |ORDER BY p_partkey""".stripMargin,
    "q17_left_join" ->
      """SELECT n_nationkey, n_name, COALESCE(cnt, 0) AS n_customers
        |FROM nation LEFT JOIN (
        |  SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey
        |) c ON n_nationkey = c_nationkey
        |ORDER BY n_nationkey""".stripMargin,
    "q18_join_on_agg" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_above FROM lineitem
         |JOIN (SELECT l_partkey AS ap_partkey,
         |        ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty
         |      FROM lineitem GROUP BY 1) a ON l_partkey = ap_partkey
         |WHERE l_quantity > avg_qty * 1.5
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q73_full_outer" ->
      """SELECT c.c_custkey, o.o_custkey, o.n_orders
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 50) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |  WHERE o_custkey > 25 GROUP BY o_custkey
        |) o ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey NULLS LAST, o.o_custkey NULLS LAST""".stripMargin,
    "q74_cross_grid" ->
      """SELECT r_name, o_orderstatus
        |FROM (SELECT r_name FROM region)
        |CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q78_arg_extremes" ->
      """SELECT o_orderstatus,
        |  arg_max(o_orderkey, o_totalprice) AS top_order,
        |  arg_min(o_orderkey, o_totalprice) AS bottom_order,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
