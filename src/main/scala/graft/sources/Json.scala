package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink (beyond the reference's CSV-only surface: the
  * interchange format most document corpora actually arrive in). One JSON
  * object per line — splittable, so a 100 TB directory scans with full
  * parallelism; schema inference samples the data (one extra pass), the
  * explicit-schema form is the production path (single pass, and
  * type-stable under corrupt records).
  */
object Json {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Inferred-schema read (sampling pass; convenient, not the scale path). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Explicit-schema read — single pass, production form. */
  def readWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
