package graft.pipeline

import graft.operators.Dedup
import graft.sources.{Csv, Sinks}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's extract → transform → load DAG re-expressed as an
  * in-process pipeline (SURVEY.md §2.10 O1-O4, §3.3).
  *
  * Stage handoff is the temp-view catalog (`extracted_data`), exactly the
  * reference's mechanism (DAG/ETL.py:29,35) — safe here because one
  * SparkSession spans all stages (the reference silently depends on
  * Airflow workers sharing a session; across processes its handoff breaks,
  * SURVEY §2.10 O2). Retries (O1) become plain `Try` + reread: each stage
  * is a pure function of durable inputs, so re-running a failed stage is
  * always safe — the property Airflow retries assume.
  *
  * The load stage writes through [[Sinks.RelationalSink]]: executor-
  * parallel batches, not the reference's driver-side row loop.
  */
object Etl {

  val ExtractedView = "extracted_data"

  /** extract: CSV → named temp view (S6). */
  def extract(spark: SparkSession, csvPath: String): Unit =
    Csv.readInferred(spark, csvPath).createOrReplaceTempView(ExtractedView)

  /** transform: SQL entry over the view (S7) → dedup on keys (D1) →
    * deterministic surrogate id. The reference uses
    * monotonically_increasing_id (nondeterministic); the pipeline defaults
    * to a row_number over an explicit order so re-runs are identical —
    * `deterministicId = false` restores reference behavior.
    */
  def transform(spark: SparkSession, dedupKeys: Seq[String],
                orderCol: String, deterministicId: Boolean = true): DataFrame = {
    val src = spark.sql(s"SELECT * FROM $ExtractedView")
    val deduped = Dedup.exact(src, dedupKeys)
    if (deterministicId) withDeterministicId(deduped, orderCol)
    else Dedup.withSurrogateId(deduped)
  }

  /** Deterministic dense surrogate id 0..n-1 in `orderCol` order (unique
    * order key required), WITHOUT a single-partition global window:
    * range-repartition + in-partition sort + zipWithIndex assigns indices
    * with one extra count job and keeps every stage distributed — the
    * 100 TB-safe replacement for both monotonically_increasing_id
    * (nondeterministic) and row_number() over a global Window (collapses
    * to one task).
    */
  def withDeterministicId(df: DataFrame, orderCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(col(orderCol))
    val withIdx = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(withIdx, sorted.schema.add("id", LongType, nullable = false))
  }

  /** load: write through the sink abstraction (K3/K4). */
  def load(df: DataFrame, sink: Sinks.RelationalSink, table: String): Unit =
    sink.overwrite(df, table)

  /** Full run, returning the transformed frame for inspection. */
  def run(spark: SparkSession, csvPath: String, dedupKeys: Seq[String],
          orderCol: String, sink: Sinks.RelationalSink, table: String): DataFrame = {
    extract(spark, csvPath)
    val out = transform(spark, dedupKeys, orderCol)
    load(out, sink, table)
    out
  }
}
