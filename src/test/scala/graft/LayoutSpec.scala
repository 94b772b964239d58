package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_layout_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("compact merges a many-small-files table to the byte-targeted count") {
    val small = tmpDir("small")
    val compacted = tmpDir("compacted")
    val c = Tables.customer(spark, sf0001)
    c.repartition(40).write.mode("overwrite").parquet(small)
    assert(parquetFiles(small).size == 40)
    val totalBytes = parquetFiles(small).map(_.length).sum
    val target = totalBytes / 4   // expect ~4 output files
    val produced = Layout.compact(spark, small, compacted, target)
    assert(parquetFiles(compacted).size == produced)
    assert(produced >= 3 && produced <= 5, s"produced=$produced")
    // content preserved exactly
    assert(spark.read.parquet(compacted).count() == c.count())
  }

  test("writeClustered produces disjoint per-file key ranges") {
    val dir = tmpDir("clustered")
    Layout.writeClustered(Tables.customer(spark, sf0001), dir, 6, "c_custkey")
    val ranges = parquetFiles(dir).map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min("c_custkey"), max("c_custkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.size >= 2)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping file ranges: $ranges")
    }
    // a point lookup's matching range lives in exactly one file
    val key = ranges(ranges.size / 2)._1
    assert(ranges.count { case (lo, hi) => lo <= key && key <= hi } == 1)
  }
}
