package graft.functions

import scala.collection.mutable

/** Ratcliff/Obershelp "gestalt" string similarity, exactly matching CPython's
  * `difflib.SequenceMatcher(None, a, b).ratio()` — the similarity metric the
  * reference uses for fuzzy counterparty matching
  * (/root/reference/soulutionOne.py:8-11, solutionTwo.py:8-11).
  *
  * Fidelity notes (validated against CPython 3.11 outputs in
  * RatcliffObershelpSpec):
  *  - ratio = 2*M / (|a|+|b|), M = total size of matching blocks found by
  *    recursively taking the longest match (earliest-in-a, then earliest-in-b
  *    on ties) and recursing on both sides.
  *  - autojunk: when |b| >= 200, characters occupying > |b|/100 + 1 positions
  *    of b are "popular" and excluded from match *seeding* (removed from the
  *    index), but still participate in match *extension* — so
  *    ratio("x"*200+"y", "x"*200+"z") is 99.5, not 0.
  *  - with no junk predicate (the reference always passes None) the junk set
  *    is empty, so the junk-extension phase is a no-op; implemented anyway
  *    for structural fidelity.
  *
  * Pure JVM scalar — O(|a|*|b|) worst case like difflib. Used from a Scala
  * UDF (JVM-local, no Python-worker crossing like the reference's
  * BatchEvalPython path — SURVEY.md §4).
  */
object RatcliffObershelp {

  /** difflib ratio in [0, 1]. Both-empty gives 1.0 (difflib._calculate_ratio).
    * Sequences are CODE POINTS, exactly like Python str elements — a
    * supplementary-plane character is one element, not a surrogate pair
    * (difflib parity for emoji/astral text is in RatcliffObershelpSpec).
    */
  def ratio(a: String, b: String, autojunk: Boolean = true): Double = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val total = ca.length + cb.length
    if (total == 0) return 1.0
    2.0 * matchTotal(ca, cb, autojunk) / total
  }

  /** The reference's string_similarity: ratio * 100. */
  def similarity(a: String, b: String): Double = ratio(a, b) * 100.0

  private def matchTotal(a: Array[Int], b: Array[Int], autojunk: Boolean): Int = {
    // b2j: code point -> ascending positions in b, with popular elements
    // purged.
    val b2j = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < b.length) {
      b2j.getOrElseUpdate(b(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    if (autojunk && b.length >= 200) {
      val ntest = b.length / 100 + 1
      val popular = b2j.iterator.collect { case (c, idx) if idx.length > ntest => c }.toList
      popular.foreach(b2j.remove)
    }

    // j2len arrays sized to b; swapped per row of a (dict-free translation of
    // difflib's inner loop — identical values, same earliest-tie behavior).
    var j2len = new Array[Int](b.length + 1)
    var newJ2len = new Array[Int](b.length + 1)

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      java.util.Arrays.fill(j2len, 0)
      var i = alo
      while (i < ahi) {
        java.util.Arrays.fill(newJ2len, 0)
        b2j.get(a(i)) match {
          case Some(indices) =>
            var p = 0
            var done = false
            while (p < indices.length && !done) {
              val jj = indices(p)
              if (jj < blo) ()                     // continue
              else if (jj >= bhi) done = true      // break (ascending)
              else {
                val k = (if (jj > 0) j2len(jj - 1) else 0) + 1
                newJ2len(jj) = k
                if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
              }
              p += 1
            }
          case None => ()
        }
        val tmp = j2len; j2len = newJ2len; newJ2len = tmp
        i += 1
      }
      // Extension phase. bjunk is always empty here (isjunk=None in the
      // reference), so only the non-junk loops can fire; popular chars DO
      // extend because they are popular, not junk.
      while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             a(besti + bestsize) == b(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    // Queue-based get_matching_blocks; only the sum of block sizes is needed.
    var totalMatched = 0
    val queue = mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, jM, k) = findLongestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        totalMatched += k
        if (alo < i && blo < jM) queue.push((alo, i, blo, jM))
        if (i + k < ahi && jM + k < bhi) queue.push((i + k, ahi, jM + k, bhi))
      }
    }
    totalMatched
  }
}
