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
  * stay pinned without a SparkSession.
  */
class BenchSchedulingSpec extends AnyFunSuite {

  private val cutoff = 60.0

  // ---- shouldAttemptAgain ------------------------------------------------

  test("attempt 0 always runs, whatever the inputs say") {
    assert(Bench.shouldAttemptAgain(0, 2, 999.0, lastBuiltPublish = false, cutoff))
    assert(Bench.shouldAttemptAgain(0, 1, 0.0, lastBuiltPublish = false, 0.0))
  }

  test("under-cutoff attempts repeat up to the nRuns budget") {
    assert(Bench.shouldAttemptAgain(1, 2, 5.0, lastBuiltPublish = false, cutoff))
    assert(!Bench.shouldAttemptAgain(2, 2, 5.0, lastBuiltPublish = false, cutoff))
  }

  test("over-cutoff non-publish attempt stops the row (signal, not noise)") {
    assert(!Bench.shouldAttemptAgain(1, 2, 61.0, lastBuiltPublish = false, cutoff))
  }

  test("publish-building attempt earns a follow-up even past the cutoff") {
    // the round-15 case: first attempt 61.25 s but it BUILT the publish —
    // its wall is publish+serve, not the row's price
    assert(Bench.shouldAttemptAgain(1, 2, 61.25, lastBuiltPublish = true, cutoff))
  }

  test("publish-building attempt earns a follow-up even under BENCH_RUNS=1") {
    // the budget counts priced attempts; a publish-laden attempt is not
    // a valid price for a serve row, so nRuns=1 still yields 2 attempts
    assert(Bench.shouldAttemptAgain(1, 1, 30.0, lastBuiltPublish = true, cutoff))
    // ...and the serve-priced follow-up then ends the row
    assert(!Bench.shouldAttemptAgain(2, 1, 5.0, lastBuiltPublish = false, cutoff))
  }

  test("poisoned publish (rebuilds every attempt) is bounded, not infinite") {
    // each attempt reports lastBuiltPublish=true; the exemption caps at
    // nRuns+1 total attempts
    val n = 2
    var attempts = 0
    while (Bench.shouldAttemptAgain(attempts, n, 10.0,
             lastBuiltPublish = attempts > 0, cutoff) && attempts < 50) {
      attempts += 1
    }
    assert(attempts == n + 1)
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
}
