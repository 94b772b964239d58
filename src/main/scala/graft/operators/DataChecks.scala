package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: evaluate a set of row-level expectations
  * in ONE scan and emit a per-rule violation report — the pre-publish
  * check every pipeline runs before a corpus snapshot ships (schema drift
  * is caught earlier by loaders; this catches VALUE drift: nulls where
  * none belong, out-of-range money, enum junk).
  *
  * Scale design: all rules fold into a single aggregate over one pass —
  * per rule a conditional count and a conditional min of the key — so the
  * report costs one scan with map-side partial aggregation and a
  * few-bytes-per-rule shuffle, regardless of corpus size or rule count.
  * The per-rule rows come out of the one aggregated row via `stack`
  * (a projection), never a second scan per rule (the naive
  * one-query-per-rule harness shape that reads 100 TB x |rules|).
  *
  * Referential rules (key exists in another table) need a join, not a
  * scan — [[fkViolations]] is the companion: a left-anti join against the
  * parent keys, reported in the same row shape so the two union into one
  * report.
  */
object DataChecks {

  /** One row per rule: (rule, n_checked, n_violations, min_bad_key).
    * A rule is an EXPECTATION — a row violates it when the predicate is
    * false or null (null-hostile on purpose: an expectation that cannot
    * be evaluated is not met). `min_bad_key` is the smallest violating
    * key — a deterministic example for triage, null when clean. Rule
    * names must be simple identifiers (used inside a stack() expression).
    */
  def audit(df: DataFrame, keyCol: String, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      s"rule names must be [A-Za-z0-9_]+: ${rules.map(_._1).mkString(",")}")
    val aggs = rules.flatMap { case (name, pred) =>
      val bad = coalesce(pred, lit(false)) === false
      // sum over an EMPTY table is null, and an empty corpus has zero
      // violations, not unknown-many
      Seq(coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__v_$name"),
        min(when(bad, col(keyCol))).as(s"__k_$name"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = rules
      .map(r => s"'${r._1}', __v_${r._1}, __k_${r._1}")
      .mkString(", ")
    row.select(
      expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations, min_bad_key)"),
      col("__n").as("n_checked"))
      .select("rule", "n_checked", "n_violations", "min_bad_key")
  }

  /** Referential-integrity companion: child keys with no matching parent
    * key, in the same report row shape as [[audit]]. ONE left join against
    * the distinct parent keys and one aggregate — orphan rows are the ones
    * whose parent key came back null, so n_checked and the violation stats
    * fall out of the same pass (an anti-join would need a second scan of
    * the child just to count n_checked, and gluing the two single-row
    * results back together is a nested-loop join Catalyst can't avoid).
    * The parent ships only its distinct key column.
    */
  def fkViolations(child: DataFrame, childKey: String, reportKey: String,
                   parent: DataFrame, parentKey: String,
                   ruleName: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(pk, child(childKey) === col("__pk"), "left")
      .agg(count(lit(1)).as("n_checked"),
        coalesce(sum(when(col("__pk").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_violations"),
        min(when(col("__pk").isNull, col(reportKey))).as("min_bad_key"))
      .select(lit(ruleName).as("rule"), col("n_checked"),
        col("n_violations"), col("min_bad_key"))
  }
}
