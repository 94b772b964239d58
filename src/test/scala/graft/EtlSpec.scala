package graft

import java.nio.file.Files

import graft.pipeline.Etl
import graft.sources.{Csv, Sinks}
import org.apache.spark.sql.functions._

class EtlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val csvDir = {
    val d = tmpDir("graft_csv")
    Seq(("1", "Acme GmbH", "DE1"), ("2", "Acme GmbH", "DE1"), ("3", "Beta AG", "DE2"))
      .toDF("pk", "Name", "IBAN")
      .coalesce(1).write.mode("overwrite").option("header", true).csv(d)
    d
  }

  test("CSV sources: all-string, format API, inferred, glob, column guard") {
    val s1 = Csv.readAllString(spark, csvDir)
    assert(s1.schema.fields.forall(_.dataType.typeName == "string"))
    assert(Csv.readFormat(spark, csvDir).count() == 3)
    val s3 = Csv.readInferred(spark, csvDir)
    assert(s3.schema("pk").dataType.typeName != "string")   // inferred as int
    assert(Csv.readDirectory(spark, csvDir).count() == 3)
    Csv.requireColumns(s1, Seq("name", "iban"))             // case-insensitive ok
    val e = intercept[IllegalArgumentException] {
      Csv.requireColumns(s1, Seq("name", "missing_col"))
    }
    assert(e.getMessage.contains("missing_col"))
  }

  test("ETL run: extract -> temp-view -> transform dedup+id -> sink") {
    val root = tmpDir("graft_sink")
    val sink = new Sinks.ParquetDirSink(root)
    val out = Etl.run(spark, csvDir, Seq("Name", "IBAN"), "pk", sink, "tbltest")
    assert(out.count() == 2)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
    val loaded = spark.read.parquet(s"$root/tbltest")
    assert(loaded.count() == 2)
  }

  test("withDeterministicId: dense, ordered, stable across reruns") {
    val df = Tables.orders(spark, sf0001)
    val a = Etl.withDeterministicId(df, "o_orderkey")
      .select("o_orderkey", "id").as[(Long, Long)].collect().sortBy(_._1)
    val b = Etl.withDeterministicId(df, "o_orderkey")
      .select("o_orderkey", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).toSeq == a.indices.map(_.toLong))   // dense 0..n-1 in key order
  }

  test("console sink (K5): show and printSchema run") {
    val df = Csv.readAllString(spark, csvDir)
    df.printSchema()
    df.show(5, truncate = false)
  }

  test("sinks: single-file CSV and parallel CSV") {
    val d1 = tmpDir("graft_out1")
    Sinks.writeSingleCsv(Seq((1, "a")).toDF("k", "v"), s"$d1/one")
    val files = new java.io.File(s"$d1/one").listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val d2 = tmpDir("graft_out2")
    Sinks.writeCsv(Seq((1, "a")).toDF("k", "v"), s"$d2/many")
    assert(spark.read.option("header", true).csv(s"$d2/many").count() == 1)
  }

  test("sinks: CSV roundtrip preserves leading/trailing whitespace") {
    // Spark's writer trims whitespace by default; the sinks disable that.
    val d = tmpDir("graft_out_ws")
    Sinks.writeSingleCsv(Seq((1, "  padded  ")).toDF("k", "v"), s"$d/ws")
    val back = Csv.readAllString(spark, s"$d/ws").collect()
    assert(back.head.getString(1) == "  padded  ")
  }
}
