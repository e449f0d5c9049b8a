package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded-window invariant (round-10 verdict item 8): an
  * unpartitioned window (`WindowExec: No Partition Defined` — all rows
  * to ONE task) is only acceptable on a frame whose size is bounded by
  * construction (days, sources, vocab caps, fixed bins, sketch states —
  * never corpus rows). Every such site in the query surface is
  * enumerated here with its bound; a new query introducing an
  * unpartitioned window fails this spec until its frame's bound is
  * reviewed and the site added. The audit walks each gate query's
  * ANALYZED logical plan, so it sees exactly what was written, before
  * any optimizer pruning.
  */
class WindowAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient var spark: SparkSession = _
  val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("window-audit-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Count Window operators with an EMPTY partition spec anywhere in the
    * plan (subqueries included). */
  private def unpartitionedWindows(plan: LogicalPlan): Int = {
    var n = 0
    plan.foreach {
      case w: LWindow if w.partitionSpec.isEmpty => n += 1
      case _ => ()
    }
    n
  }

  /** One pass over every gate query (building a query executes its
    * localCheckpoints, so this loop is the expensive part — both audits
    * share it): unpartitioned-window counts AND container-typed output
    * columns, plus any construction failures. */
  private def auditAll(): (Map[String, Int], Map[String, Seq[String]], Seq[String]) = {
    val windows = scala.collection.mutable.Map.empty[String, Int]
    val containers = scala.collection.mutable.Map.empty[String, Seq[String]]
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val n = unpartitionedWindows(df.queryExecution.analyzed)
        if (n > 0) windows(name) = n
        val nested = SparkEntry.containerCols(df.schema)
        if (nested.nonEmpty) containers(name) = nested
      } catch {
        case scala.util.control.NonFatal(e) =>
          failed += s"$name: ${e.getMessage}"
      }
    }
    (windows.toMap, containers.toMap, failed.toSeq)
  }

  private lazy val (gotWindows, gotContainers, buildFailures) = auditAll()

  test("unpartitioned windows appear ONLY at reviewed bounded-frame sites") {
    // query -> number of unpartitioned-window sites, each reviewed as
    // sitting on a bounded frame (the bound is the comment).
    val allowed: Map[String, Int] = Map(
      "q71_moving_avg" -> 1,           // daily aggregates: |days| rows
      "q98_series_fill_linear" -> 4,   // gap-fill over the |days| grid
      "q102_window_median" -> 1,       // 7-day median over |days| rows
      "q194_budget_waterfill" -> 5,    // |sources| rows (source budgets)
      "q203_sample_apportionment" -> 1, // |strata| rows
      "q207_exact_quantiles" -> 1,     // histogram rows = price domain / 4096
      "q229_pareto_frontier" -> 1)     // score-domain-collapsed rows (run-min)
    assert(buildFailures.isEmpty,
      s"query construction failed: ${buildFailures.mkString("; ")}")
    assert(gotWindows == allowed,
      s"unpartitioned-window sites drifted.\n  now:     ${gotWindows.toSeq.sorted}\n" +
        s"  allowed: ${allowed.toSeq.sorted}\n" +
        "A new site means a window moves ALL rows to one task — prove its " +
        "frame is bounded by construction, then add it here with the bound.")
  }

  test("no gate query emits a container-typed output column") {
    // The driver comparator sorts RAW cells before stringifying; an
    // array/struct/map cell is unsortable in pandas and errors the row
    // (round 12, q257: 'unhashable type: numpy.ndarray' — the round-3
    // q56 class re-learned). Gated outputs must be scalar columns only:
    // render containers with to_json(...) or explode to rows. There is
    // deliberately NO allowlist here.
    assert(gotContainers.isEmpty,
      s"container-typed gate outputs (driver comparator cannot sort these):\n" +
        gotContainers.toSeq.sortBy(_._1).map { case (q, cols) =>
          s"  $q -> ${cols.mkString(", ")}"
        }.mkString("\n"))
  }
}
