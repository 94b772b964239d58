package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed SELECTION (k-th smallest) over an unbounded 64-bit
  * domain — the complement of [[TextOps.lengthQuantiles]]'s
  * bounded-domain histogram: when the value domain can't be histogrammed
  * whole (prices, timestamps, hashes), refine a RADIX PREFIX instead.
  * Each pass aggregates the 16-bit extension of the current prefix
  * (≤ 65536 counts to the driver), the driver picks the bucket containing
  * the k-th value and recurses into it; four passes pin all 64 bits.
  *
  * 100 TB shape: four full scans (the prefix filter is an expression on
  * the column, so it prunes work per row, not files) with map-side
  * combinable 2^16-group aggregates and KB-sized driver state — versus a
  * global sort's full shuffle, or an approx sketch's error bar. Signed
  * longs are handled by the order-preserving unsigned flip
  * (v XOR Long.MinValue), so the full domain works, negatives included.
  * Exactly deterministic: duplicates count with multiplicity, the k-th
  * element of the sorted multiset comes back bit-exact (DuckDB-oracled
  * through the row_number spelling).
  */
object Selection {

  /** The k-th smallest (1-based) value of `valueCol` (long). */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long): Long =
    kthSmallestOf(df, valueCol, k,
      df.filter(col(valueCol).isNotNull).count())

  /** [[kthSmallest]] with the non-null count supplied — callers that
    * already paid the counting scan ([[medianReport]]) skip the repeat.
    */
  private def kthSmallestOf(df: DataFrame, valueCol: String, k: Long,
                            n: Long): Long = {
    require(k >= 1 && k <= n, s"k=$k out of range [1, $n]")
    // order-preserving unsigned view: u = v XOR MinValue
    val u = col(valueCol).cast("long").bitwiseXOR(lit(Long.MinValue))
    var prefix = 0L      // fixed high bits (unsigned view), aligned left
    var remaining = k
    for (shift <- Seq(48, 32, 16, 0)) {
      val matches =
        if (shift == 48) df.filter(col(valueCol).isNotNull)
        else df.filter(col(valueCol).isNotNull &&
          shiftrightunsigned(u, shift + 16) === lit(prefix))
      val counts = matches
        .groupBy(shiftrightunsigned(u, shift).bitwiseAND(lit(0xffffL)).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      var acc = 0L
      var chosen = -1L
      counts.iterator.takeWhile(_ => chosen < 0).foreach { case (b, c) =>
        if (acc + c >= remaining) chosen = b else acc += c
      }
      assert(chosen >= 0, s"selection invariant broken at shift $shift")
      remaining -= acc
      prefix = (prefix << 16) | chosen
    }
    prefix ^ Long.MinValue
  }

  /** One-row lower-median report: (n_rows, k, median) with
    * k = (n+1)/2 — the audit row the oracle checks via the row_number
    * spelling.
    */
  def medianReport(df: DataFrame, valueCol: String): DataFrame = {
    val n = df.filter(col(valueCol).isNotNull).count()
    val spark = df.sparkSession
    import spark.implicits._
    if (n == 0) Seq.empty[(Long, Long, Long)].toDF("n_rows", "k", "median")
    else {
      val k = (n + 1) / 2
      Seq((n, k, kthSmallestOf(df, valueCol, k, n)))
        .toDF("n_rows", "k", "median")
    }
  }
}
