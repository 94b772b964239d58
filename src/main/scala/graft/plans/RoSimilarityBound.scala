package graft.plans

import graft.functions.RatcliffObershelpSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: prefix `ro_similarity(a, b) >= t` (and `>`) threshold
  * predicates with difflib's `real_quick_ratio` upper bound as a cheap
  * short-circuit conjunct:
  *
  *   ratio = 2·M / (|a|+|b|)  with  M <= min(|a|,|b|)
  *   =>  similarity <= 200·min(|a|,|b|) / (|a|+|b|)
  *
  * The bound is three length ops per pair vs the O(|a|·|b|) gestalt
  * matcher, and `And` short-circuits, so length-skewed candidate pairs
  * (threshold 80 forces a length ratio >= 2/3) never reach the matcher.
  * Semantics-preserving by construction: the bound expression replays the
  * similarity kernel's exact FP op order (2.0·x / total · 100.0) with the
  * integer numerator only ever LARGER, and IEEE division/multiplication
  * are monotone, so bound >= similarity holds bit-exactly (property-tested
  * in PipelineOpsSpec); Spark's `length` counts code points exactly like
  * the kernel. Both-empty inputs make the bound 0/0 = NaN, which Spark
  * orders above every number — the pair falls through to the exact
  * predicate, never wrongly pruned.
  *
  * This is the `Rule[LogicalPlan]` extension tier (SURVEY §7.2): the
  * rewrite applies transparently to both the Column API and SQL
  * (`GraftExtensions` injects it cluster-wide;
  * [[graft.Graft.enableOptimizations]] adds it to a live session). The
  * rewrite recursion is self-stabilizing: an already-guarded conjunct
  * matches the first case and is left untouched, so the optimizer's
  * fixed-point batches terminate.
  */
object RoSimilarityBound extends Rule[LogicalPlan] {

  private def bound(ro: RatcliffObershelpSimilarity): Expression = {
    val la = Cast(Length(ro.left), DoubleType)
    val lb = Cast(Length(ro.right), DoubleType)
    // ((2.0 * min) / (la + lb)) * 100.0 — the kernel's op order
    Multiply(
      Divide(Multiply(Literal(2.0), Least(Seq(la, lb))), Add(la, lb)),
      Literal(100.0))
  }

  private def guarded(cmp: BinaryComparison, ro: RatcliffObershelpSimilarity,
                      t: Expression): Expression = cmp match {
    case _: GreaterThanOrEqual => And(GreaterThanOrEqual(bound(ro), t), cmp)
    case _: GreaterThan => And(GreaterThan(bound(ro), t), cmp)
    case _ => cmp
  }

  private def isGuard(l: Expression, cmp: BinaryComparison): Boolean =
    cmp match {
      case GreaterThanOrEqual(ro: RatcliffObershelpSimilarity, t) =>
        l.semanticEquals(GreaterThanOrEqual(bound(ro), t))
      case GreaterThan(ro: RatcliffObershelpSimilarity, t) =>
        l.semanticEquals(GreaterThan(bound(ro), t))
      case _ => false
    }

  private def rewrite(e: Expression): Expression = e match {
    case And(l, cmp: BinaryComparison) if isGuard(l, cmp) => e
    case And(l, r) => And(rewrite(l), rewrite(r))
    case Or(l, r) => Or(rewrite(l), rewrite(r))
    case Not(c) => Not(rewrite(c))
    case cmp @ GreaterThanOrEqual(ro: RatcliffObershelpSimilarity, t: Literal) =>
      guarded(cmp, ro, t)
    case cmp @ GreaterThan(ro: RatcliffObershelpSimilarity, t: Literal) =>
      guarded(cmp, ro, t)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter => f.copy(condition = rewrite(f.condition))
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }
}
