package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF (point-in-time) join — for each left row, the most
  * recent right row with the same keys and right.ts <= left.ts (inclusive).
  * The operator Spark's API lacks and training-data pipelines constantly
  * need: point-in-time feature attachment ("the user's last purchase before
  * this event") without future leakage.
  *
  * NOT implemented as a range theta-join (which Catalyst would plan as a
  * per-key cartesian — O(|L|·|R|) within hot keys). Instead the classic
  * union-and-sweep shape:
  *
  *   1. tag left rows side=1, right rows side=0, union on (keys, ts, side);
  *   2. ONE shuffle on `keys`, in-partition sort by (ts, side) — right
  *      rows sort before left rows at equal ts, which is exactly the
  *      inclusive <= semantics;
  *   3. a running `last(right_payload, ignoreNulls)` window carries the
  *      latest right row forward over the sweep;
  *   4. keep left rows, project the carried payload.
  *
  * Cost is the same as one groupBy over L ∪ R — linear shuffle, no
  * candidate blowup, AQE-skew-splittable: the shape that survives 100 TB
  * of events against years of dimension history. DuckDB's native ASOF
  * LEFT JOIN oracles it exactly (q_asof_join).
  *
  * Determinism: callers must make right unique per (keys, ts) — with
  * duplicates the carried row would be sort-order-dependent. (q_asof_join
  * pre-aggregates max(event_id) per (user_id, ts); an assertion here would
  * cost a full pass, so the contract is documented instead.) Null ts rows
  * never match and are dropped from the right side.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, prefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val rightPayload = right.columns.filterNot(keys.contains)   // includes tsCol
    val leftStruct = struct(left.columns.map(col): _*)
    val rightStruct = struct(rightPayload.map(col): _*)

    val ru = right.filter(col(tsCol).isNotNull)
      .select(keyCols :+ col(tsCol).as("__ts") :+ rightStruct.as("__r"): _*)
    val lu = left
      .select(keyCols :+ col(tsCol).as("__ts") :+ leftStruct.as("__l"): _*)
      .withColumn("__r", lit(null).cast(ru.schema("__r").dataType))
      .withColumn("__side", lit(1))
    val u = ru
      .withColumn("__l", lit(null).cast(lu.schema("__l").dataType))
      .withColumn("__side", lit(0))
      .unionByName(lu)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        rightPayload.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}
