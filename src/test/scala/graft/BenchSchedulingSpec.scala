package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's attempt-scheduling and recheck-eligibility decisions —
  * extracted pure after the round-15 pricing artifact: the 60 s repeat
  * cutoff denied q_cluster_cc_serve its serve-priced second attempt
  * because the FIRST attempt (publish+serve by design, 61 s on a hot
  * box) tripped the cutoff, and the same cutoff condition inside the
  * recheck filter made the row ineligible for the post-suite noise
  * recheck too — the rows most in need of a second look were the only
  * ones that couldn't get one. The two decisions live in
  * [[Bench.shouldAttemptAgain]] / [[Bench.recheckClass]] so these cases
  * stay pinned without a SparkSession. The budget counts PRICED
  * attempts (publish-building attempts are excluded), so serve rows
  * keep the same min-of-nRuns robustness as every other row.
  */
class BenchSchedulingSpec extends AnyFunSuite {

  private val cutoff = 60.0

  /** Drive the scheduler over a script of (wallSec, builtPublish)
    * attempt outcomes; returns how many attempts ran. Mirrors Bench's
    * main-pass loop exactly (buf.length, buf.count(built), last wall,
    * last built).
    */
  private def runSchedule(nRuns: Int,
      outcomes: LazyList[(Double, Boolean)]): Int = {
    val ran = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
    val it = outcomes.iterator
    while (Bench.shouldAttemptAgain(ran.length, ran.count(_._2), nRuns,
             ran.lastOption.map(_._1).getOrElse(0.0),
             ran.lastOption.exists(_._2), cutoff) && it.hasNext) {
      ran += it.next()
    }
    ran.length
  }

  // ---- shouldAttemptAgain ------------------------------------------------

  test("attempt 0 always runs, whatever the inputs say") {
    assert(Bench.shouldAttemptAgain(0, 0, 2, 999.0,
      lastBuiltPublish = false, cutoff))
    assert(Bench.shouldAttemptAgain(0, 0, 1, 0.0,
      lastBuiltPublish = false, 0.0))
  }

  test("ordinary rows: under-cutoff attempts repeat up to the nRuns budget") {
    val fast = LazyList.continually((5.0, false))
    assert(runSchedule(2, fast) == 2)
    assert(runSchedule(3, fast) == 3)
  }

  test("over-cutoff non-publish attempt stops the row (signal, not noise)") {
    assert(runSchedule(2, LazyList((61.0, false), (5.0, false))) == 1)
  }

  test("publish-building attempt earns a follow-up even past the cutoff") {
    // the round-15 case: first attempt 61.25 s but it BUILT the publish —
    // its wall is publish+serve, not the row's price
    assert(Bench.shouldAttemptAgain(1, 1, 2, 61.25,
      lastBuiltPublish = true, cutoff))
  }

  test("serve rows get the FULL priced budget: publish attempt consumes none") {
    // nRuns=2: attempt 0 builds the publish, attempts 1 and 2 are
    // serve-priced — min-of-2 like every other row (the round-16 review
    // finding: budget must count priced attempts, not raw attempts)
    val outcomes = LazyList((12.7, true), (5.7, false), (5.8, false),
      (5.6, false))
    assert(runSchedule(2, outcomes) == 3)
  }

  test("publish-building attempt earns a follow-up even under BENCH_RUNS=1") {
    val outcomes = LazyList((30.0, true), (5.0, false), (5.0, false))
    assert(runSchedule(1, outcomes) == 2)
  }

  test("poisoned publish (rebuilds every attempt) is bounded at nRuns+1, not infinite") {
    val poisoned = LazyList.continually((10.0, true))
    assert(runSchedule(2, poisoned) == 3)
    assert(runSchedule(1, poisoned) == 2)
  }

  // ---- recheckClass ------------------------------------------------------

  test("inflated under-cutoff row is recheck-eligible") {
    assert(Bench.recheckClass(10.0, Some(5.0), 1.5, cutoff, failed = false)
      == Bench.RecheckEligible)
  }

  test("inflated over-cutoff row is surfaced as OverCutoff, never dropped") {
    // the round-15 invisibility: min 61.25 vs baseline 6.0 was neither
    // rechecked nor reported — now it must classify OverCutoff
    assert(Bench.recheckClass(61.25, Some(6.0), 1.5, cutoff, failed = false)
      == Bench.RecheckOverCutoff)
  }

  test("in-band, missing-baseline, and failed rows are Clean") {
    assert(Bench.recheckClass(6.0, Some(5.0), 1.5, cutoff, failed = false)
      == Bench.RecheckClean)
    assert(Bench.recheckClass(100.0, None, 1.5, cutoff, failed = false)
      == Bench.RecheckClean)
    assert(Bench.recheckClass(100.0, Some(5.0), 1.5, cutoff, failed = true)
      == Bench.RecheckClean)
  }

  test("boundary: exactly noiseFactor x baseline is in band; exactly cutoff is eligible") {
    assert(Bench.recheckClass(7.5, Some(5.0), 1.5, cutoff, failed = false)
      == Bench.RecheckClean)
    assert(Bench.recheckClass(60.0, Some(5.0), 1.5, cutoff, failed = false)
      == Bench.RecheckEligible)
  }

  // ---- bracketIsHot (mid-window calibration ticks, round 17) -------------

  test("flat calibration series is never hot") {
    val flat = Seq((0, 0.30), (25, 0.31), (50, 0.29), (60, 0.30))
    assert(!Bench.bracketIsHot(flat, 10, 1.5))
    assert(!Bench.bracketIsHot(flat, 40, 1.5))
    assert(!Bench.bracketIsHot(flat, 59, 1.5))
  }

  test("the r16 blind spot: heat between flat endpoints is visible to its bracket only") {
    // start 0.305 / end 0.295 read quiet; the mid-window tick caught the
    // contention that inflated queries 25..49
    val series = Seq((0, 0.305), (25, 0.90), (50, 0.31), (60, 0.295))
    assert(Bench.bracketIsHot(series, 30, 1.5))  // bracketed 25..50: hot
    assert(Bench.bracketIsHot(series, 24, 1.5))  // right-bounded by the hot tick
    assert(!Bench.bracketIsHot(series, 55, 1.5)) // quiet tail bracket
  }

  test("bracket boundaries: a tick at exactly pos bounds on the left; hot scales off the quietest tick") {
    val series = Seq((0, 0.30), (25, 0.60), (50, 0.30))
    // pos 25 is bracketed by the tick AT 25 (left) and 50 (right)
    assert(Bench.bracketIsHot(series, 25, 1.5))
    // 0.60 vs quiet 0.30 = 2.0x: hot at factor 1.5, quiet at factor 2.5
    assert(!Bench.bracketIsHot(series, 25, 2.5))
  }

  test("degenerate series (fewer than two ticks) can never classify hot") {
    assert(!Bench.bracketIsHot(Seq.empty, 5, 1.5))
    assert(!Bench.bracketIsHot(Seq((0, 0.9)), 5, 1.5))
  }
}
