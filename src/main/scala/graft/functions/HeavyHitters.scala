package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed mergeable `Aggregator`:
  * at most `k` (item, counter) pairs of state, one pass, and the classic
  * guarantee — every item with true frequency > n/(k+1) of the n inputs is
  * guaranteed to be IN the final candidate set (counters are lower bounds
  * with error <= n/(k+1); Misra & Gries 1982; merge rule per Agarwal et
  * al., "Mergeable Summaries", PODS'12: sum counters, then subtract the
  * (k+1)-th largest and drop non-positives — the guarantee survives
  * arbitrary merge trees, which is exactly what Spark's partial
  * aggregation does).
  *
  * Scale shape: this is the candidate-generation half of the standard
  * candidates-then-verify pattern ([[graft.operators.TextOps
  * .heavyHitterTokens]]): the full corpus reduces map-side to k-entry
  * sketches (KBs through the shuffle regardless of corpus size), a second
  * exact pass recounts ONLY the candidates, and the guarantee makes the
  * verified output exact — a "top tokens over 100 TB" without ever hash-
  * aggregating the full token domain. The reduce step's decrement path is
  * O(k) but runs at most n/(k+1) times total (each decrement consumes k+1
  * arrival credits), so a partition costs O(n) amortized.
  *
  * The candidate SET is deterministic enough for the pipeline's gate
  * (guaranteed superset of the true heavy hitters) but its exact extras
  * depend on arrival order — so the sketch itself is never a query
  * output; only the exact-verified filter is.
  */
class HeavyHitters(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    b.get(v) match {
      case Some(c) => b.updated(v, c + 1)
      case None if b.size < k => b.updated(v, 1L)
      case None =>
        // decrement-all; drop zeros (the arriving item is consumed too)
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter from all, keep positives
      val cut = summed.values.toSeq.sortBy(-_).apply(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  // Sorted for a deterministic finish; counters are intentionally NOT
  // exposed (they are lower bounds — consumers must exact-recount).
  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object HeavyHitters {
  /** Column form: candidate heavy hitters of a string column (sorted
    * array; guaranteed superset of items with frequency > n/(k+1)).
    */
  def heavy_hitter_candidates(c: Column, k: Int): Column =
    udaf(new HeavyHitters(k)).apply(c)
}
