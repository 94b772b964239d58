package graft

import graft.operators.{LshTune, NearDup}

/** The banding policy: S-curve math, the argmin choices at the thresholds
  * that matter, agreement between the pure-driver chooser and the oracled
  * Spark table, and the pinned NearDup constants being the policy's own
  * answer at the engine's operating threshold.
  */
class LshTuneSpec extends SparkSpec {

  test("bandings enumerates the divisor pairs, bands ascending") {
    assert(LshTune.bandings(16) ===
      Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1)))
    assert(LshTune.bandings(12) ===
      Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)))
    assert(LshTune.bandings(1) === Seq((1, 1)))
  }

  test("pCandidate is the S-curve: monotone in s, 0 at 0, 1 at 1") {
    val probes = (0 to 10).map(_ / 10.0)
    for ((b, r) <- LshTune.bandings(16)) {
      val ps = probes.map(LshTune.pCandidate(_, b, r))
      assert(ps.head === 0.0 && math.abs(ps.last - 1.0) < 1e-12, (b, r))
      assert(ps.zip(ps.tail).forall { case (lo, hi) => lo <= hi }, (b, r))
    }
    // more rows per band = stricter: fewer candidates at every interior s
    assert(LshTune.pCandidate(0.5, 2, 8) < LshTune.pCandidate(0.5, 4, 4))
    assert(LshTune.pCandidate(0.5, 4, 4) < LshTune.pCandidate(0.5, 8, 2))
  }

  test("tune picks the measured argmin at the thresholds that matter") {
    assert(LshTune.tune(16, 0.5) === ((4, 4)))  // the engine's operating point
    assert(LshTune.tune(16, 0.7) === ((4, 4)))
    assert(LshTune.tune(16, 0.3) === ((8, 2)))  // loose threshold: wide net
    assert(LshTune.tune(16, 0.8) === ((2, 8)))  // tight: precision regime
    assert(LshTune.tune(16, 0.9) === ((1, 16)))
  }

  test("the pinned NearDup banding IS the policy's answer at threshold 0.5") {
    assert(LshTune.tune(NearDup.NumHashes, 0.5) ===
      ((NearDup.Bands, NearDup.RowsPerBand)))
  }

  test("rows per band is non-decreasing in the threshold (selectivity monotonicity)") {
    val rs = (5 to 95 by 5).map(t => LshTune.tune(16, t / 100.0)._2)
    assert(rs.zip(rs.tail).forall { case (lo, hi) => lo <= hi }, rs)
  }

  test("tune always returns a valid factorization with a finite error mass") {
    for (n <- 1 to 64; t <- Seq(0.1, 0.35, 0.5, 0.75, 0.9)) {
      val (b, r) = LshTune.tune(n, t)
      assert(b * r == n && b >= 1 && r >= 1, s"n=$n t=$t -> ($b,$r)")
      val e = LshTune.errorMass(b, r, t)
      assert(e >= 0.0 && e <= 1.0, s"n=$n t=$t err=$e")
    }
  }

  test("the oracled Spark table agrees with the driver chooser") {
    val rows = LshTune.bandingErrorTable(spark, 16, 0.5).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.keySet === LshTune.bandings(16).toSet)
    // fixed-point table vs driver double math: within gridN ulp-floors
    for (((b, r), e12) <- rows) {
      val expect = LshTune.errorMass(b, r, 0.5) * 1000 * 1e12
      assert(math.abs(e12 - expect) <= 1000.0, s"($b,$r): $e12 vs $expect")
    }
    // and the table's argmin is the tune() choice
    val argmin = rows.minBy { case ((b, _), e) => (e, b) }._1
    assert(argmin === LshTune.tune(16, 0.5))
  }
}
