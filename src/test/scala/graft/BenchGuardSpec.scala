package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchGuard]]: the committed-baseline regression gate's thresholds
  * and its parse of the real committed artifacts. */
class BenchGuardSpec extends AnyFunSuite {
  private val base = Map("q01" -> 0.10, "g05" -> 4.0, "d09" -> 5.0)

  test("clean run passes") {
    assert(BenchGuard.check(100.0, base, base, 130.0).isEmpty)
  }

  test("per-query regression past max(2x, +0.5s) fails; jitter under the floor passes") {
    // 0.10 -> 0.55 is 5.5x but within the +0.5s jitter floor
    assert(BenchGuard.check(100.0, base + ("q01" -> 0.55), base, 130.0).isEmpty)
    // 0.10 -> 0.65 crosses both (>2x and >+0.5s)
    val v = BenchGuard.check(100.0, base + ("q01" -> 0.65), base, 130.0)
    assert(v.exists(_.contains("REGRESSED: q01")))
    // 4.0 -> 7.9 is under 2x -> passes; 4.0 -> 8.1 fails
    assert(BenchGuard.check(100.0, base + ("g05" -> 7.9), base, 130.0).isEmpty)
    assert(BenchGuard.check(100.0, base + ("g05" -> 8.1), base, 130.0)
      .exists(_.contains("REGRESSED: g05")))
  }

  test("a zero baseline entry gates on the +0.5s floor and reports n/a, not Infinityx") {
    val zb = base + ("q99" -> 0.0)
    assert(BenchGuard.check(100.0, zb + ("q99" -> 0.4), zb, 130.0).isEmpty)
    val v = BenchGuard.check(100.0, zb + ("q99" -> 0.6), zb, 130.0)
    assert(v.exists(l => l.contains("REGRESSED: q99") && l.contains("(n/a)")))
    assert(!v.exists(_.contains("Infinity")))
  }

  test("over-budget total fails even with no per-query regression") {
    val v = BenchGuard.check(131.0, base, base, 130.0)
    assert(v.size == 1 && v.head.startsWith("OVER BUDGET"))
  }

  test("a baseline query missing from the run fails; new queries do not") {
    assert(BenchGuard.check(100.0, base - "d09", base, 130.0)
      .exists(_.contains("MISSING from run: d09")))
    assert(BenchGuard.check(100.0, base + ("x99" -> 1.0), base, 130.0).isEmpty)
  }

  test("the committed baseline parses and covers the full query surface") {
    val (total, qs) = BenchGuard.load("bench_baseline.json")
    assert(total > 0 && total <= 130.0,
      s"committed baseline total $total must itself be inside the budget")
    assert(qs.size == SparkEntry.queries.size,
      s"baseline has ${qs.size} queries, surface has ${SparkEntry.queries.size} " +
        "— refresh bench_baseline.json after adding queries")
    assert(SparkEntry.queries.keySet == qs.keySet)
  }
}
