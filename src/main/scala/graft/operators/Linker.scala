package graft.operators

import graft.functions.{canonical_key, string_similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship linking pipeline (soulutionOne.py Task 2,
  * SURVEY.md §3.1): similarity pair join (J1: F1 name-inequality ∧ F2
  * non-empty guard ∧ F3 similarity-threshold disjunction) → canonical
  * cluster key (P7 least) → per-cluster member sets via a window
  * `collect_set` (A2/W1) → projection drop + dedup (P4/D4).
  *
  * Differences from the reference, by design (SURVEY §7.4 determinism):
  *  - member sets are emitted as `concat_ws(",", sort_array(collect_set))`
  *    instead of `cast(array → string)` — the reference's array order is
  *    partition-dependent, which would make every re-run (and any oracle
  *    compare) differ;
  *  - all predicates are JVM-native (no Python-worker crossings; the
  *    reference pays two BatchEvalPython boundaries per candidate pair).
  */
object Linker {

  /** J1: naive similarity self-join, exactly the reference's semantics
    * (Ratcliff/Obershelp >= threshold on name OR on the alt column when
    * present, anti-reflexive on name, non-empty alt guard). Catalyst plans
    * BroadcastNestedLoopJoin — O(n²); the reference acknowledges this shape
    * doesn't scale (solutionThree.py:17). Scale substitutes with bounded
    * candidates: [[EditDistanceJoin]] (exact) and the MinHash/SimHash ops
    * (approximate).
    */
  def similarityPairs(df: DataFrame, nameCol: String,
                      altCol: Option[String], threshold: Double): DataFrame = {
    val base = altCol match {
      case Some(alt) => df.select(col(nameCol).as("name"), col(alt).as("alt"))
      case None      => df.select(col(nameCol).as("name"), lit("x").as("alt"))
    }
    val simPred = altCol match {
      case Some(_) =>
        (string_similarity(col("a.name"), col("b.name")) >= threshold) ||
          (string_similarity(col("a.alt"), col("b.alt")) >= threshold)
      case None =>
        string_similarity(col("a.name"), col("b.name")) >= threshold
    }
    // Repartition the probe side: a small table often arrives as ONE parquet
    // partition, and BroadcastNestedLoopJoin parallelism = left-side
    // partitions — without this the whole O(n²) predicate runs in one task.
    val para = df.sparkSession.sparkContext.defaultParallelism
    base.repartition(para).as("a").join(base.as("b"),
        (col("a.name") =!= col("b.name")) &&
        (col("a.alt") =!= lit("")) && (col("b.alt") =!= lit("")) &&
        simPred, "inner")
      .select(
        canonical_key(col("a.name"), col("b.name")).as("uniqId"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.alt").as("alt_a"), col("b.alt").as("alt_b"))
  }

  /** A2/W1 + P4 + D4: attach per-`partitionCol` sorted distinct member sets
    * via an unordered window (whole-partition frame, as in the reference),
    * then collapse to one row per cluster. (valueCol -> outputCol) pairs.
    */
  def windowCollect(pairs: DataFrame, partitionCol: String,
                    values: Seq[(String, String)]): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
    val withSets = values.foldLeft(pairs) { case (d, (src, dst)) =>
      d.withColumn(dst, concat_ws(",", sort_array(collect_set(col(src)).over(w))))
    }
    withSets
      .select((partitionCol +: values.map(_._2)).map(col): _*)
      .dropDuplicates()
  }

  /** Result-identical groupBy form of [[windowCollect]]: one hash aggregate
    * instead of window-materializing the member-set string onto every pair
    * row before deduplicating. For an unordered whole-partition frame the
    * two are equivalent; the window form exists for reference parity
    * (soulutionOne uses it), this form is what survives dense clusters —
    * with m-member clusters the window path materializes O(pairs x m)
    * bytes, this one O(clusters x m).
    */
  def groupCollect(pairs: DataFrame, partitionCol: String,
                   values: Seq[(String, String)]): DataFrame =
    pairs.groupBy(col(partitionCol))
      .agg(concat_ws(",", sort_array(collect_set(col(values.head._1)))).as(values.head._2),
        values.tail.map { case (src, dst) =>
          concat_ws(",", sort_array(collect_set(col(src)))).as(dst)
        }: _*)

  /** Full Task-1 + Task-2 pipeline shape on a generic (name, alt) table:
    * exact dedup, then link, then cluster member sets.
    */
  def pipeline(df: DataFrame, nameCol: String, altCol: Option[String],
               threshold: Double): DataFrame = {
    val deduped = Dedup.exact(df, nameCol +: altCol.toSeq)
    val pairs = similarityPairs(deduped, nameCol, altCol, threshold)
    val values = Seq("name_a" -> "CollectedNames") ++
      (if (altCol.isDefined) Seq("alt_a" -> "CollectedAlts") else Nil)
    groupCollect(pairs, "uniqId", values)
  }
}
