package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints the parquet ReadSchema of every query's physical plan — a fast
  * column-pruning audit (a scan reading all columns for a 2-column
  * projection is a bug at 100 TB).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val reads = "ReadSchema: struct<([^>]*)>".r
          .findAllMatchIn(plan).map(_.group(1)).toSeq.distinct
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
          .findAllMatchIn(plan).map(_.group(1)).filter(_.nonEmpty).toSeq.distinct
        println(s"[explain] $name")
        reads.foreach(r => println(s"  read: $r"))
        pushed.foreach(p => println(s"  pushed: $p"))
      } catch { case e: Throwable =>
        println(s"[explain] $name FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
