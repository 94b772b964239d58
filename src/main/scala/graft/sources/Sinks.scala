package graft.sources

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Output surface (SURVEY.md §2.2).
  *
  * K1/K2 CSV writes; K3/K4 relational loads behind [[RelationalSink]] so
  * environments without a database (this sandbox, unit tests) swap in
  * [[ParquetDirSink]] — same interface, same pipeline code.
  */
object Sinks {

  /** Spark's CSV WRITER trims leading/trailing whitespace by default
    * (write-side ignoreLeading/TrailingWhiteSpace default true) — a lossy
    * roundtrip the reference's to_csv never does. Both sinks disable it.
    */
  private def csvWriter(df: DataFrame) =
    df.write.option("header", true)
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)

  /** K1: single-file header'd CSV, overwrite — the reference's output
    * contract (coalesce(1) only at the FINAL write; upstream stages keep
    * full parallelism, unlike the reference which pays the single-task
    * bottleneck on every intermediate write too).
    */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    csvWriter(df.coalesce(1)).mode("overwrite").csv(path)

  /** K2: parallel CSV write, default error-if-exists mode. */
  def writeCsv(df: DataFrame, path: String): Unit =
    csvWriter(df).csv(path)

  /** K3/K4 abstraction: a relational (or stand-in) table sink. */
  trait RelationalSink {
    def append(df: DataFrame, table: String): Unit
    def overwrite(df: DataFrame, table: String): Unit
  }

  /** K3/K4 real implementation: executor-parallel JDBC batches — replaces
    * the reference's driver-side one-INSERT-per-row pymysql loop
    * (DAG/ETL.py:97-104) and TRUNCATE + LOAD DATA INFILE (DAG/sample.py:71-87).
    * `overwrite` uses option("truncate", true) to keep the target schema.
    */
  final class JdbcSink(url: String, props: Properties) extends RelationalSink {
    def append(df: DataFrame, table: String): Unit =
      df.write.mode("append").jdbc(url, table, props)
    def overwrite(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").option("truncate", "true").jdbc(url, table, props)
  }

  /** Test/sandbox stand-in: tables are parquet dirs under a root. */
  final class ParquetDirSink(root: String) extends RelationalSink {
    def append(df: DataFrame, table: String): Unit =
      df.write.mode("append").parquet(s"$root/$table")
    def overwrite(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(s"$root/$table")
  }
}
