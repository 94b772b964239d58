package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** Grouped top-k as a WHOLE-OPERATOR extension — the (c) rung of the
  * extension ladder next to the scalar Expressions and the optimizer
  * Rules: a custom LogicalPlan node, a SparkStrategy planning it, and a
  * physical SparkPlan pair, registered via SparkSessionExtensions
  * ([[graft.GraftExtensions]]) / `experimental.extraStrategies`
  * ([[graft.Graft.enableOptimizations]]).
  *
  * Why a physical operator at all: the DataFrame spellings of "k best
  * rows per key" either sort every group's every row under a window
  * (row_number — per-partition SORT of the full data) or ship k values
  * per group as an aggregate STATE ([[graft.functions.MinK]] — but the
  * rows come back as structs, not rows, and the k values ride inside one
  * aggregation buffer). The physical operator keeps the rows AS ROWS and
  * the memory at k per key: a per-partition bounded heap pass (PARTIAL —
  * no distribution requirement, runs map-side), then the exchange
  * Catalyst inserts for the FINAL node's ClusteredDistribution, then the
  * same bounded-heap pass emitting each group's k rows with a dense
  * rank. Shuffle volume is per-partition-groups × k rows — the window
  * shape shuffles everything. Correctness of the partial pass: the global
  * top-k of a key is a subset of the union of its per-partition top-ks.
  *
  * Deliberate scope bounds (documented, not accidental): not
  * CodegenSupport (the heap pass is iterator code; the child's codegen
  * span closes at the exchange anyway), and per-partition memory is
  * groups×k rows — the hash-aggregate memory shape; a grouped-spill
  * variant would mirror ObjectHashAggregate's fallback.
  */
object TopKPerKey {

  /** k best rows per key with a dense 1-based `rankName` column appended;
    * "best" = first in the given (column, ascending) lexicographic order
    * with deterministic output given a deterministic order (add a unique
    * tie-break column, exactly as a window spelling would need).
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 order: Seq[(String, Boolean)], k: Int,
                 rankName: String = "topk_rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(keys.nonEmpty && order.nonEmpty, "keys and order must be non-empty")
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val keyExprs = keys.map(attr)
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    DatasetBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrder, k, rankAttr, analyzed))
  }
}

/** Logical node. `rankAttr` lives in the constructor so `copy` during
  * plan transforms preserves its exprId (a val-made attribute would mint
  * a fresh id per copy and orphan downstream references).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: AttributeReference,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // report every child column as referenced: the operator re-emits whole
  // rows, so ColumnPruning must not slide a Project underneath
  override def references: AttributeSet = child.outputSet ++
    AttributeSet(keys.flatMap(_.references) ++ order.flatMap(_.references))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans the node as a partial/final exec pair around the exchange. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      val partial = TopKPerKeyExec(n.keys, n.order, n.k, None, planLater(n.child))
      TopKPerKeyExec(n.keys, n.order, n.k, Some(n.rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap pass. `rankAttr` None = PARTIAL (no distribution
  * requirement, emits surviving rows unranked); Some = FINAL (requires
  * clustering on the keys — Catalyst inserts the exchange — and emits
  * each group's k rows in sort order with a dense 1-based rank).
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Option[Attribute],
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keySeq = keys
    val orderSeq = order
    val kk = k
    val isFinal = rankAttr.isDefined
    val outputAttrs = output
    child.execute().mapPartitions { iter =>
      val keyGen = UnsafeProjection.create(keySeq, childOutput)
      // ord.compare(a, b) < 0  <=>  a sorts before b ("better")
      val ord = GenerateOrdering.generate(orderSeq, childOutput)
      // max-heap under ord: head = the WORST retained row, evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with keyGen's REUSED buffer; copy the key only when a new
        // group is inserted — a per-row copy would be allocation churn on
        // exactly the hot path this operator exists for
        val probe = keyGen(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kk) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy()
        }
      }
      if (!isFinal) heaps.valuesIterator.flatMap(_.iterator)
      else {
        val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
        val joined = new JoinedRow
        heaps.valuesIterator.flatMap { heap =>
          // dequeueAll drains in priority order (worst first) -> reverse
          val best = heap.dequeueAll.reverse
          best.iterator.zipWithIndex.map { case (r, i) =>
            toUnsafe(joined(r, new GenericInternalRow(Array[Any]((i + 1).toLong))))
              .copy()
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
