package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion surface (SURVEY.md §2.1 S1-S4 + §2.5 F6 + §2.10 O4).
  *
  * The reference reads everything as header'd CSV, either schema-less (all
  * strings — soulutionOne.py:28) or inferred (DAG/ETL.py:26), with a
  * fail-fast required-column guard (soulutionOne.py:34-38) and a
  * per-file directory loop (DAG/ingest_csv_file.py:16-21). The glob form
  * replaces the loop: one distributed scan instead of n sequential reads.
  */
object Csv {

  /** S1: header'd read, no inference — every column StringType. */
  def readAllString(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).csv(path)

  /** S2: same via the format/load API (solutionThree.py:8). */
  def readFormat(spark: SparkSession, path: String): DataFrame =
    spark.read.format("csv").option("header", "true").load(path)

  /** S3: header'd read with schema inference (DAG paths). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** S4: directory ingest — one distributed scan of the directory (the
    * reference loops os.listdir and reads serially). `pathGlobFilter`
    * keeps the "only *.csv" semantics while listing the directory itself
    * rather than expanding a wildcard glob path: glob expansion races
    * with just-committed writes under a loaded local scheduler
    * (FileNotFoundException despite the part files existing), a directory
    * listing does not.
    */
  def readDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", true).option("pathGlobFilter", "*.csv").csv(dir)

  /** F6: fail fast if required columns are missing (case-insensitive, like
    * Spark's default resolution).
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = required.filterNot(c => have(c.toLowerCase))
    require(missing.isEmpty,
      s"input is missing required columns: ${missing.mkString(", ")}")
    df
  }
}
