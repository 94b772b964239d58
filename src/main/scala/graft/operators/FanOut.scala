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

  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}

  /** True when the plan is scan-shaped: a leaf (file scan, local relation)
    * under nothing but narrow per-row operators. Only such plans are probed
    * for their physical partition count — `df.rdd.getNumPartitions` forces
    * physical planning, and under AQE on a frame that CONTAINS exchanges it
    * eagerly executes the upstream shuffle stages (AdaptiveSparkPlanExec
    * materializes stages on doExecute), running jobs whose results are then
    * thrown away. A non-scan-shaped frame passes through unwidened: its
    * exchanges already re-establish parallelism, so the widen would buy
    * nothing and the probe could double-execute the upstream pipeline.
    */
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode         => true
    case Project(_, c)       => scanShaped(c)
    case Filter(_, c)        => scanShaped(c)
    case SubqueryAlias(_, c) => scanShaped(c)
    case _                   => false
  }

  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    if (!scanShaped(df.queryExecution.analyzed)) return df
    val para = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < para) df.repartition(para) else df
  }
}
