package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for per-row-heavy projections (optimization
  * round 18, guide §2.5): a batch input that arrives as fewer partitions
  * than the session's parallelism — the single-file, single-row-group
  * fixture scan is the canonical case — serializes every downstream
  * codegen stage until the first exchange, so an expensive projection
  * (shingling, token segmentation, quality scoring) runs one-task while
  * the rest of the box idles (measured: a 6.6 s 3-task verify stage and
  * 2–3 s single-task chunk/score stages at sf0.1). The guide's remedy is
  * to repartition immediately after the unsplittable read; this helper
  * makes that remedy SCALE-CONDITIONAL — a corpus-sized scan already
  * carries more partitions than cores and passes through untouched, so
  * the extra exchange exists exactly where the alternative is a
  * single-task stage, never as an unconditional data movement at 100 TB.
  * Streaming frames pass through (no partition introspection on an
  * unstarted stream).
  */
private[graft] object FanOut {
  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val para = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < para) df.repartition(para) else df
  }
}
