package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-privacy gates for publishing (Sweeney's k-anonymity, the
  * suppression form): a row may ship only if at least `k` rows share its
  * quasi-identifier combination, so no released row is attributable to a
  * group smaller than k. The structural counterpart of the value-level
  * PII scrub ([[TextOps]] pii ops): scrubbing hides identifiers INSIDE a
  * document, suppression hides documents whose METADATA combination is
  * itself identifying (the lone Basque-language doc from one source is
  * identifiable however well its text is scrubbed).
  *
  * Scale shape: one hash aggregate over the QI columns (map-side
  * combinable, group-count-sized result) joined back to the corpus on the
  * same key — two shuffles on the QI tuple, no window sort, no forced
  * broadcast (the QI-group frame is data-dependent; AQE broadcasts it
  * when genuinely small). Deterministic by construction: membership
  * depends only on group counts.
  */
object Privacy {

  /** Corpus rows with their QI-group size attached, joined back with
    * NULL-SAFE equality (`<=>`) so rows with a NULL quasi-identifier form
    * a countable group like any other value instead of vanishing from
    * both the kept and the suppressed partitions (a null QI — "language
    * unknown" — is often the MOST identifying combination, and it must
    * reach the review queue). The aggregate already groups nulls
    * together; the null-safe join keeps the two sides consistent, so
    * kept ∪ suppressed == input always holds.
    */
  private def withGroupN(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    val counts = qiCols.foldLeft(
        df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("qi_group_n"))) {
      (d, c) => d.withColumnRenamed(c, s"__qi_$c")
    }
    val on = qiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    qiCols.foldLeft(df.join(counts, on))((d, c) => d.drop(s"__qi_$c"))
  }

  /** Keep rows whose quasi-identifier group has >= k members; adds the
    * group size as `qi_group_n` (the audit column — publishing pipelines
    * log the k-distribution of what shipped).
    */
  def kSuppress(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, s"need QI columns and k >= 1 (k=$k)")
    withGroupN(df, qiCols).filter(col("qi_group_n") >= k)
  }

  /** The rows [[kSuppress]] would drop, with their group size — the
    * review queue (suppressed rows are often exactly the interesting
    * long-tail content; pipelines route them to generalization — widen a
    * QI bucket — rather than silently discarding).
    */
  def kSuppressed(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, s"need QI columns and k >= 1 (k=$k)")
    withGroupN(df, qiCols).filter(col("qi_group_n") < k)
  }
}
