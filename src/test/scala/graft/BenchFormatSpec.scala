package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the Bench stdout contract: the harness keeps only the last
  * ~2000 characters of output and parses the JSON line out of that tail.
  * Round 3 overflowed it (58 queries x two full-precision maps ≈ 3.4 kB)
  * and the round's bench was recorded as `parsed: null`. This spec
  * reconstructs the line at its worst-case width from the real query
  * list, so adding queries fails HERE instead of silently un-parsing the
  * next round's bench.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("bench JSON line fits the harness tail buffer at worst-case width") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val short = names.map(Bench.wireKey)
    assert(short.distinct.size == names.size,
      "bare-number bench keys must stay unique across query names")
    // Worst case per entry: 99, — a position-keyed array in sorted
    // full-name order (compaction #7: per-entry keys overflowed the
    // tail at 233 queries even as 2-char base-62; earlier: 1 ms values
    // at 122, 99.99 at 140, 9.99 at 150, 9.9 at 203, the decimal point
    // at 204). Position i decodes via sorted(queries); wireKey still
    // names the ov/cp singleton entries.
    val entries = short.map(_ => "99").mkString("[", ",", "]")
    // ov (clamp saturation) carries the worst clamp-saturated query
    // (r8's q135 ran 27.7 s but printed 9.9 — the saturation must be
    // visible from the wire line) at 99.99 display max. Tail-field
    // names are single/double-char (e/ov/cp/ca) since compaction #5 —
    // the longer names overflowed at 159, 163, and 201 queries.
    val overClamp = short.sortBy(-_.length).take(2)
      .map(n => "\"" + n + "\":99.99").mkString("{", ",", "}")
    // cp: the slowest clean query's executor cpu/run ratio (9.99
    // display clamp) — the host-steal discriminator the r9 judge needed
    // the gitignored detail file for.
    val cpuRatio = short.sortBy(-_.length).take(1)
      .map(n => "\"" + n + "\":9.99").mkString("{", ",", "}")
    // st (stage pricing, round 12): every StageMemo build listed at
    // unclamped deciseconds — worst case is ALL known stages built in
    // one run at 4-digit width (999.9 s each, far past anything real).
    val stField = Bench.KnownStages
      .map(n => "\"" + n + "\":9999").mkString("{", ",", "}")
    // nh (r17): 8-hex names-list fingerprint — fixed width by construction
    val nh = Bench.namesHash(names)
    assert(nh.length == 8 && nh.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"names hash must be 8 lowercase hex chars, got '$nh'")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","queries":$entries,"e":999,"ov":$overClamp,"sat":999,"st":$stField,"cp":$cpuRatio,"ca":99.999,"nh":"$nh","sf":"sf0.1"}"""
    // 2000-char tail minus what actually FOLLOWS the line in the
    // capture: the tail truncates from the FRONT, so only post-line
    // content eats budget — measured, that is sbt's single
    // "[success] Total time: ..." line (~80 chars incl. newlines);
    // stderr/bench prints come BEFORE the line and cost nothing.
    assert(line.length < 1912,
      s"bench line would be ${line.length} chars; trim the format or query names")
  }

  test("queries wire shape: full run = positional array in sorted-name order, subset = keyed map") {
    // Wire compaction #7's decode rule, asserted here as ADVICE r10
    // requested (not only documented in BENCH_NOTES): a full run's
    // `queries` array element i is query i in SORTED full-name order —
    // the same order the run loop produces and bench_detail.json rows
    // use — while a SPARK_GRAFT_BENCH_ONLY subset keeps the keyed map
    // (positions in a subset would index sorted(selected) and the
    // full-list decode would silently misattribute timings).
    val rs = Seq(("q01_a", 0.2, 0.1, true), ("q02_b", 0.5, 0.4, true),
      ("q10_c", 1.0, 0.9, false))
    assert(Bench.wireQueries(rs, subset = false, _._3) == "[1,4,-1]")
    assert(Bench.wireQueries(rs, subset = true, _._3) ==
      """{"1":1,"2":4,"a":-1}""")
    // the array decode DEPENDS on sorted order — unsorted input must be
    // rejected loudly, never encoded
    val unsorted = Seq(("q02_b", 0.5, 0.4, true), ("q01_a", 0.2, 0.1, true))
    intercept[IllegalArgumentException] {
      Bench.wireQueries(unsorted, subset = false, _._3)
    }
  }

  test("a query that throws is reported as an error, never as a timing") {
    // Round 7's regression shipped because Bench.time() caught the
    // exception and returned the elapsed 0.06 s — 22 broken queries
    // showed up as the suite's FASTEST rows. The protocol now carries an
    // ok flag end-to-end and the wire renders -1 for failures.
    val (_, _, ok) = Bench.protocol("boom", () => throw new RuntimeException("q broken"))
    assert(!ok, "a throwing query must be marked failed")
    assert(Bench.wireValue(0.06, ok = false) == "-1",
      "failed queries must print the -1 sentinel on the wire")
    assert(Bench.wireValue(0.06, ok = true) == "1",
      "clean values are integer deciseconds since compaction #6")
    assert(Bench.wireValue(1.24, ok = true) == "12")
    assert(Bench.wireValue(42.0, ok = true) == "99", "clean values clamp at 99 ds (9.9 s)")
    // a query that only fails on a LATER run is failed too — no partial
    // timings laundered into the clean column
    var calls = 0
    val (_, _, okLater) = Bench.protocol("flaky",
      () => { calls += 1; if (calls > 1) throw new RuntimeException("flaky") })
    assert(!okLater)
  }

  test("rounded values render dot-decimal regardless of default locale") {
    val s = String.format(java.util.Locale.ROOT, "%.3f", Double.box(1.5))
    assert(s == "1.500")
  }

  test("every query is oracled — the rows-only list is EMPTY and stays empty") {
    // The correctness gate only verifies queries with an oracle; anything
    // else gets a weaker rows-only check. As of round 5 every query has
    // one — engine-only operators (minhash/simhash/ANN) ship
    // self-certifying contracts or arithmetic-replicated oracles instead
    // of opting out. A new query cannot silently ship unverified.
    val rowsOnly = Set.empty[String]
    val queries = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    // the count the docs (README, SURVEY §8) advertise — update BOTH
    // when adding a query, or the driver-contract documentation drifts
    assert(queries.size == 283, s"query count ${queries.size} != documented 283")
    assert(oracled.subsetOf(queries),
      s"oracles without queries: ${(oracled -- queries).toSeq.sorted}")
    assert((queries -- oracled) == rowsOnly,
      s"un-oracled queries outside the known list: ${(queries -- oracled -- rowsOnly).toSeq.sorted}")
  }

  test("contract-tier queries are explicitly listed — the weaker oracle tier stays visible") {
    // These oracles recompute their NUMERIC columns genuinely (exact pair
    // or user counts) but pin a self-check boolean as literal TRUE: the
    // hash gate trip-wires the engine's in-query certification (LSH/
    // SimHash recall, HLL/percentile error bounds) rather than
    // independently re-deriving the approximate structure. That is a
    // weaker verification tier than the other queries' full oracles, and
    // this test keeps the set explicit — adding a new contract-style
    // oracle (or silently weakening a full oracle to booleans) must
    // touch this list.
    // Round 10 retired q146/q155 (full blocked-kNN-graph re-derivation)
    // and then q35/q36 (LSH + exact truth and SimHash banding + planted
    // Hamming, both recomputed via the shared q151/q152 oracle chains)
    // from this tier. What remains is exactly the queries wrapping
    // Spark-INTERNAL approximate sketches (HLL++, approx-percentile)
    // that no external engine can re-derive bit-for-bit.
    val contractTier = Set(
      "q45_approx_distinct", "q97_hll_rollup", "q104_approx_percentile")
    val pinsBooleans = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.toLowerCase.matches("(?s).*\\btrue\\b.*as\\s+\\w*_ok\\b.*")
    }.keySet
    assert(pinsBooleans == contractTier,
      s"contract-tier drift: pinned-boolean oracles are ${pinsBooleans.toSeq.sorted}")
  }
}
