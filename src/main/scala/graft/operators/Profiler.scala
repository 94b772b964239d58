package graft.operators

import org.apache.spark.sql.DataFrame
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
}
