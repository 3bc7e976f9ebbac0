package graft

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/**
 * Machine-enforced bench-regression gate (round-10 verdict item #2:
 * "the budget has been protected by judge discipline, not machinery").
 *
 * Diffs a fresh [[Bench]] artifact against the committed
 * `bench_baseline.json` and exits non-zero when
 *  - the run total exceeds the budget (130 s — 2× the reference DAG's
 *    ~65 s wall at sf0.1, BASELINE.md), or
 *  - any query regressed past `max(2 × baseline, baseline + 0.5 s)` —
 *    the +0.5 s floor keeps 50 ms queries from flagging on scheduler
 *    jitter while still catching every regression that could move the
 *    total, or
 *  - a baseline query is missing from the run (a silently-dropped
 *    query would otherwise read as a speedup).
 *
 * Usage: `runMain graft.BenchGuard [runJson] [baselineJson]` after a
 * `runMain graft.Bench` under the BASELINE.md protocol (quiet host,
 * tmpfs scratch reaped, min-of-2). The committed baseline is the
 * round-14 FINAL-BUILD SINGLE MEASURED RUN
 * (`bench_runs/bench_r14_run5.json`, 92.7 s over all 204 queries in a
 * quiet window — median per-query ratio 0.93 vs the mid-round run-3
 * artifact it replaces, BenchGuard zero flags). A single artifact is
 * preferred over a min-composite whenever the host allows one,
 * because a composite of best-evers can mask a uniform small
 * regression (the round-12 verdict's caveat); fall back to a
 * composite only when steal denies a clean window, and record the
 * contributing run set in BASELINE.md either way. The 2×/+0.5 s
 * slack absorbs ordinary steal inflation (measured 1.1–1.4×;
 * round-12 check: zero false flags across seven steal-affected runs),
 * while a genuinely waved run can still trip the budget arm — the
 * conservative direction for a budget gate. New queries absent
 * from the baseline are listed informationally and gated only by the
 * total. Budget override: SPARK_GRAFT_BENCH_BUDGET (seconds).
 */
object BenchGuard {

  /** Violation report lines; empty = gate passes. Pure so the gate's
    * thresholds are unit-testable without forking a JVM. */
  def check(runTotal: Double, run: Map[String, Double],
            base: Map[String, Double], budget: Double): Seq[String] = {
    val missing = base.keySet.diff(run.keySet).toSeq.sorted
      .map(q => s"MISSING from run: $q")
    // a negative run value is Bench's "measurement invalid" sentinel
    // (query crashed, or a non-finite timing was clamped) — without
    // this arm it would silently PASS and even lower the run total,
    // turning a broken measurement into "BenchGuard: OK" (every query
    // is gated, new ones included: an invalid measurement is invalid
    // regardless of baseline membership)
    val invalid = run.toSeq.filter(_._2 < 0).map(_._1).sorted
      .map(q => s"INVALID measurement (negative sentinel): $q")
    val regressed = base.toSeq.sortBy(_._1).flatMap { case (q, b) =>
      run.get(q).filter(r => r > math.max(2.0 * b, b + 0.5)).map { r =>
        // a zero baseline entry degenerates the 2× arm to the +0.5 s
        // floor (pass/fail is fine) but r/b would print Infinityx
        val ratio = if (b > 0) f"${r / b}%.1fx" else "n/a"
        f"REGRESSED: $q: $b%.2f s -> $r%.2f s ($ratio)"
      }
    }
    val over = if (runTotal > budget)
      Seq(f"OVER BUDGET: $runTotal%.1f s > $budget%.0f s") else Nil
    missing ++ invalid ++ regressed ++ over
  }

  def load(p: String): (Double, Map[String, Double]) = {
    val node = new ObjectMapper().readTree(java.nio.file.Paths.get(p).toFile)
    val qs = node.get("queries").properties().asScala
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
    (node.get("value").asDouble(), qs)
  }

  def main(args: Array[String]): Unit = {
    val runPath = args.headOption.getOrElse("target/bench_local.json")
    val basePath = if (args.length > 1) args(1) else "bench_baseline.json"
    val budget = sys.env.get("SPARK_GRAFT_BENCH_BUDGET").map(_.toDouble)
      .getOrElse(130.0)
    val (runTotal, run) = load(runPath)
    val (baseTotal, base) = load(basePath)
    println(f"BenchGuard: run $runTotal%.1f s vs baseline $baseTotal%.1f s " +
      f"(budget $budget%.0f s), ${run.size} queries")
    val added = run.keySet.diff(base.keySet).toSeq.sorted
    if (added.nonEmpty)
      println(s"  new queries (gated by total only): ${added.mkString(", ")}")
    val violations = check(runTotal, run, base, budget)
    violations.foreach(v => println(s"  $v"))
    if (violations.nonEmpty) { println("BenchGuard: FAIL"); sys.exit(1) }
    println("BenchGuard: OK")
  }
}
