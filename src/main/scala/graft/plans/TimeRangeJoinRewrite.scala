package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite inner joins whose condition contains a bounded
  * absolute-difference predicate
  *
  *   ... AND abs(la - rb) <= W        (la from the left side, rb from the
  *                                     right, W a positive integer literal)
  *
  * into the bucket-and-explode equi-join [[graft.operators.RangeJoin]]
  * applies by hand: quantize both operands into width-W buckets, explode
  * the right side to its {b-1, b, b+1} neighborhood, and join on bucket
  * equality with the ORIGINAL condition kept as the exact verify. Without
  * an equi conjunct Catalyst can only plan the abs predicate as a
  * nested-loop/cartesian — O(n·m). After the rewrite the join is a plain
  * shuffle-hash/sort-merge equi-join: linear shuffle, AQE skew handling,
  * 3x constant inflation on the probe side only.
  *
  * The rule fires ONLY when the condition has no other usable equi
  * conjunct — i.e., exactly when the alternative is a nested loop, where
  * the rewrite is an unconditional win. With an equi key present the
  * range predicate is already a cheap post-filter on a hash join, and
  * whether bucketing pays depends on key density (dense keys: yes;
  * selective keys like EditDistanceJoin's variant hashes: the 3x probe
  * inflation is pure loss). That is a statistics question the optimizer
  * cannot answer reliably here, so keyed range joins keep their plan and
  * the dense-key case uses [[graft.operators.RangeJoin.timeRangePairs]]
  * explicitly — the same reason Databricks makes its range-join
  * optimization hint-gated.
  *
  * Soundness: two values within W of each other land in the same or
  * adjacent width-W buckets, so bucket(la) ∈ {bucket(rb)-1, bucket(rb),
  * bucket(rb)+1} is implied by the original predicate — adding the bucket
  * conjunct never drops a qualifying pair. The three exploded buckets are
  * distinct, so each surviving pair still appears exactly once. A null
  * operand nulls its bucket and fails the added equality — but it already
  * failed the original abs predicate, so the result set is unchanged.
  * Buckets are computed with exact integer floor division
  * ((x - pmod(x, W)) div W — true floor for negatives too), never through
  * a double, so there is no precision cliff at nanosecond epochs; the
  * rewrite deliberately targets INTEGER operands only (epoch
  * micros/nanos, sequence numbers) and leaves fractional types alone.
  *
  * Self-stabilizing for the optimizer's fixed-point batches: the rewrite
  * introduces a left-side projection named [[BucketCol]], whose presence
  * in a join's children marks it as already rewritten.
  */
object TimeRangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BucketCol = "__graft_range_bucket"

  /** Exact floor(x / w) over longs: (x - pmod(x, w)) div w. */
  private def bucket(x: Expression, w: Long): Expression = {
    val xl = x.dataType match {
      case LongType => x
      case _ => Cast(x, LongType)
    }
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, wl)), wl)
  }

  private def intLiteral(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** Matches abs(a - b) <= w (or < w) with a positive integer literal w,
    * returning (a, b, w). `<` is widened to the same bucket geometry —
    * strictly-within-W pairs are a subset of within-W pairs.
    */
  private def rangePred(e: Expression): Option[(Expression, Expression, Long)] =
    e match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), lim) =>
        intLiteral(lim).filter(_ > 0)
          .filter(_ => isIntegral(a) && isIntegral(b)).map(w => (a, b, w))
      case LessThan(Abs(Subtract(a, b, _), _), lim) =>
        intLiteral(lim).filter(_ > 0)
          .filter(_ => isIntegral(a) && isIntegral(b)).map(w => (a, b, w))
      case GreaterThanOrEqual(lim, abs @ Abs(_, _)) =>
        rangePred(LessThanOrEqual(abs, lim))
      case GreaterThan(lim, abs @ Abs(_, _)) =>
        rangePred(LessThan(abs, lim))
      case _ => None
    }

  private def sideOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[Boolean] =
    if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet) && e.references.nonEmpty) Some(false)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !left.output.exists(_.name == BucketCol) &&
          !right.output.exists(_.name == BucketCol) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // If the join already has an equi conjunct, Catalyst plans a hash /
      // sort-merge join and the abs predicate is a cheap post-filter —
      // rewriting would only inflate the probe side 3x. The bucket trick
      // pays off exactly when the range predicate is the ONLY thing
      // standing between the join and a nested loop. (The per-key-history
      // case — equi key plus range, hot keys — is better served by AQE
      // skew splitting than by unconditional inflation.)
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) =>
          (sideOf(l, left, right), sideOf(r, left, right)) match {
            case (Some(a), Some(b)) => a != b
            case _ => false
          }
        case EqualNullSafe(l, r) =>
          (sideOf(l, left, right), sideOf(r, left, right)) match {
            case (Some(a), Some(b)) => a != b
            case _ => false
          }
        case _ => false
      }
      val hit = if (hasEqui) None else conjuncts.iterator.flatMap { c =>
        rangePred(c).flatMap { case (a, b, w) =>
          (sideOf(a, left, right), sideOf(b, left, right)) match {
            case (Some(true), Some(false)) => Some((a, b, w))
            case (Some(false), Some(true)) => Some((b, a, w))
            case _ => None
          }
        }
      }.toSeq.headOption
      hit match {
        case None => j
        case Some((la, rb, w)) =>
          val lAlias = Alias(bucket(la, w), BucketCol)()
          val newLeft = Project(left.output :+ lAlias, left)
          val rBucket = bucket(rb, w)
          val arr = CreateArray(Seq(
            Subtract(rBucket, Literal(1L)), rBucket,
            Add(rBucket, Literal(1L))))
          val generator = Explode(arr)
          val genAttr = DataTypeUtils.toAttributes(generator.elementSchema)
            .head.withName(BucketCol)
          val newRight = Generate(generator, unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(genAttr), right)
          val newCond = And(cond,
            EqualTo(lAlias.toAttribute, genAttr))
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
