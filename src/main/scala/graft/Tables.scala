package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated fixtures
  * (/root/repo/TESTDATA.md). Table name = file stem, matching the names
  * the driver's DuckDB oracle registers.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The driver has shipped events.parquet with two different physical
    * encodings of `ts` across fixture generations — INT64 TIMESTAMP(NANOS)
    * (which Spark 4 rejects outright, PARQUET_TYPE_ILLEGAL, hence the
    * nanosAsLong legacy read) and plain TIMESTAMP_MICROS (NTZ). The loader
    * adapts to whichever the file actually carries instead of assuming one,
    * so a fixture regeneration cannot silently break every event query
    * again; [[normalizeEventTs]] is the single conversion point shared by
    * the batch loader, the streaming specs, and anything else reading the
    * raw file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Inert when ts is already a timestamp; required to read legacy
    // INT64-nanos fixtures at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  /** Normalize `ts` to microsecond TimestampType regardless of how the
    * fixture encoded it. Works on batch and streaming DataFrames (pure
    * projection).
    *
    *  - LongType (legacy nanos-as-long read): rebuild with TRUE floor
    *    division — `div` alone truncates toward zero, which differs by 1µs
    *    from DuckDB's epoch_us flooring for pre-1970 negative nanos;
    *    subtracting the always-nonnegative pmod first makes the quotient
    *    exact for any sign.
    *  - TimestampNTZType (TIMESTAMP_MICROS, isAdjustedToUTC=false): cast to
    *    TimestampType. The cast interprets the naive value in the session
    *    timezone, which every graft main pins to UTC — so the micros are
    *    bit-identical to the file's and to DuckDB's
    *    `epoch_us(CAST(ts AS TIMESTAMP))` oracle reading of the same file.
    *  - TimestampType: already what downstream expects.
    *
    * Any other type fails fast with a "fixtures changed" message instead of
    * a deep Catalyst analysis error (see FixtureContractSpec).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type $other — driver fixtures changed; " +
          "extend Tables.normalizeEventTs for the new encoding")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
