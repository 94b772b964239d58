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
                      t: Expression): Expression = {
    val b = bound(ro)
    // A foldable bound (both arguments literal) would be constant-folded
    // to a boolean and stripped by BooleanSimplification in the shared
    // fixed-point batch — re-guarding every iteration would oscillate to
    // maxIterations. There is nothing to short-circuit per-row anyway.
    if (b.foldable) cmp
    else cmp match {
      case _: GreaterThanOrEqual => And(GreaterThanOrEqual(b, t), cmp)
      case _: GreaterThan => And(GreaterThan(b, t), cmp)
      case _ => cmp
    }
  }

  /** Already-guarded detection must be LOOSE: on the
    * spark.sql.extensions injection path this rule sits in the same
    * fixed-point batch as ConstantFolding, which partially folds the
    * guard whenever a similarity argument is a literal (Length(lit) → lit
    * and onward) — an exact semanticEquals against the freshly built,
    * unfolded guard would then never match and the batch would stack one
    * guard per iteration until maxIterations. So: any same-direction
    * comparison against the same threshold, whose left side is not itself
    * a similarity call, counts as the guard. False positives (a user's
    * own `x >= t` conjunct directly left of the similarity predicate)
    * only skip the optimization, never change semantics.
    */
  private def isGuard(l: Expression, cmp: BinaryComparison): Boolean = {
    def notRo(e: Expression): Boolean =
      !e.exists(_.isInstanceOf[RatcliffObershelpSimilarity])
    (l, cmp) match {
      case (GreaterThanOrEqual(lb, lt), GreaterThanOrEqual(_: RatcliffObershelpSimilarity, t)) =>
        lt.semanticEquals(t) && notRo(lb)
      case (GreaterThan(lb, lt), GreaterThan(_: RatcliffObershelpSimilarity, t)) =>
        lt.semanticEquals(t) && notRo(lb)
      case _ => false
    }
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
