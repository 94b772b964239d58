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

  /** Keep rows whose quasi-identifier group has >= k members; adds the
    * group size as `qi_group_n` (the audit column — publishing pipelines
    * log the k-distribution of what shipped).
    */
  def kSuppress(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, s"need QI columns and k >= 1 (k=$k)")
    val counts = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_group_n"))
    df.join(counts, qiCols).filter(col("qi_group_n") >= k)
  }

  /** The rows [[kSuppress]] would drop, with their group size — the
    * review queue (suppressed rows are often exactly the interesting
    * long-tail content; pipelines route them to generalization — widen a
    * QI bucket — rather than silently discarding).
    */
  def kSuppressed(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, s"need QI columns and k >= 1 (k=$k)")
    val counts = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_group_n"))
    df.join(counts, qiCols).filter(col("qi_group_n") < k)
  }
}
