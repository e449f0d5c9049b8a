package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fnv64, Mix64}
import graft.operators.LlmQueries

/** Known-answer pins for the engine-independent hash primitives that the
  * q151/q152 oracles replicate in DuckDB SQL (HUGEINT arithmetic). The
  * reference values were computed with an independent big-integer
  * implementation (Python, mod-2^64 arithmetic) — if either side drifts
  * (a refactor of the Scala fold, or an edit to the oracle constants),
  * the cross-engine hash equality silently breaks, so both the Scala
  * values and the seed-stream constants are pinned here exactly.
  */
class HashPrimitivesSpec extends AnyFunSuite {

  test("Fnv64 matches the FNV-1a reference values") {
    assert(Fnv64.hash("abc") == -1792535898324117685L)
    assert(Fnv64.hash("the quick brown") == -8421630478583369269L)
    // empty input = offset basis (14695981039346656037 wrapped)
    assert(Fnv64.hash("") == 0xcbf29ce484222325L)
    // multi-byte UTF-8 goes through the same byte fold
    assert(Fnv64.hash("Ünïcode tøken") == java.lang.Long.parseUnsignedLong("13710823177940965362"))
  }

  test("Mix64 matches the murmur3 fmix64 reference values") {
    assert(Mix64.compute(0L) == 0L)
    assert(Mix64.compute(42L) == -9148929187392628276L)
    assert(Mix64.compute(-1L) == 7256831767414464289L)
  }

  test("MinhashSeeds is the pinned splitmix64(42) stream") {
    val s = LlmQueries.MinhashSeeds
    assert(s.size == 16)
    assert(s.distinct.size == 16, "seeds must be distinct")
    assert(s(0) == -4767286540954276203L)
    assert(s(1) == 2949826092126892291L)
    assert(s(15) == 3752715396868486130L)
  }

  test("the composed minhash family value matches the reference") {
    // mh_0(fnv('abc')) — the exact composition the q151 oracle re-derives
    assert(Mix64.compute(Fnv64.hash("abc") ^ LlmQueries.MinhashSeeds(0)) ==
      -4212004881806215809L)
  }
}
