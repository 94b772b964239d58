package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic per-column data-quality profile — the "what am I looking at"
  * scan run against every new table before it enters a pipeline: one
  * output row per column with row count, null count, and exact distinct
  * count.
  *
  * ONE pass over the data: all columns' aggregates ride a single
  * `agg(...)` (Spark plans the multi-distinct via Expand — one scan,
  * 2·ncols-way row replication through a map-side-combinable hash
  * aggregate, the same shape as q_multi_distinct). The single result row
  * is then pivoted driver-side into per-column rows — a scalar-row
  * materialization like `Dataset.observe`, not a data collect.
  *
  * Exact distincts are the right default at profile time (they are what
  * you key decisions off); swap `count_distinct` for
  * `approx_count_distinct` at the one call site when the column domain
  * itself is corpus-sized.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("n_rows") +: fields.flatMap { f =>
      Seq(
        // coalesce: sum over ZERO rows is null, and the profile of an
        // empty table must still be well-formed rows of zeros
        coalesce(sum(when(col(f.name).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"nn_${f.name}"),
        count_distinct(col(f.name)).as(s"nd_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = row.getLong(0)
    fields.zipWithIndex.map { case (f, i) =>
      (f.name, nRows, row.getLong(1 + 2 * i), row.getLong(2 + 2 * i))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }

  /** CURATION FUNNEL — the per-stage retention ledger every dataset
    * release publishes (rows in → after exact dedup → after language ID →
    * after quality gate → after length gate), with the surviving doc and
    * token counts per stage. The audit that says WHERE the corpus mass
    * goes before anyone commits to a full curation run; stages mirror
    * q_curation_pipeline's composite and are cumulative.
    *
    * Output: (stage_ord, stage, n_docs, n_tokens), 5 rows.
    *
    * ONE corpus pass at 100 TB: the exact-dedup survivor flag is a window
    * min over the fingerprint groups (the funnel's only shuffle — the
    * same hash partitioning the dedup itself would pay), every other
    * stage flag is a codegen projection (language fold, quality, token
    * count), and the five ledger rows come from ONE conditional aggregate
    * exploded into rows — never five scans of the corpus.
    */
  def curationFunnel(docs: DataFrame, idCol: String, textCol: String,
                     minQuality: Double = 0.5,
                     minTokens: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flagged = TextOps.languageScores(
        docs.withColumn("__fp", TextOps.fingerprint(col(textCol))), textCol)
      // row_number, not id === min(id): a min-equality flag would keep
      // EVERY row tied at the min id, double-counting when idCol isn't
      // unique (a sharded union re-profiled) — row_number keeps exactly
      // one per fingerprint group, matching Dedup.canonical and the
      // DuckDB oracle's row_number() = 1 spelling
      .withColumn("__surv", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(col(idCol))) === 1)
      .withColumn("__nt", TextOps.tokenCount(col(textCol)))
      .withColumn("__q", TextOps.qualityScore(col(textCol)))
    val k1 = col("__surv")
    val k2 = k1 && col("lang_pred") === "en"
    val k3 = k2 && col("__q") >= minQuality
    val k4 = k3 && col("__nt") >= minTokens
    def cnt(f: Column) = coalesce(sum(when(f, 1L).otherwise(0L)), lit(0L))
    def tok(f: Column) = coalesce(sum(when(f, col("__nt")).otherwise(0L)), lit(0L))
    val agg = flagged.agg(
      count(lit(1)).as("d0"), coalesce(sum(col("__nt")), lit(0L)).as("t0"),
      cnt(k1).as("d1"), tok(k1).as("t1"),
      cnt(k2).as("d2"), tok(k2).as("t2"),
      cnt(k3).as("d3"), tok(k3).as("t3"),
      cnt(k4).as("d4"), tok(k4).as("t4"))
    val stages = Seq((0, "raw"), (1, "exact_dedup"), (2, "lang_en"),
      (3, "quality"), (4, "min_tokens"))
    agg.select(explode(array(stages.map { case (i, nm) =>
        struct(lit(i).as("stage_ord"), lit(nm).as("stage"),
          col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"))
      }: _*)).as("s"))
      .select(col("s.stage_ord"), col("s.stage"),
        col("s.n_docs"), col("s.n_tokens"))
  }
}
