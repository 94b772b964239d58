package graft.tools

import graft.{GraftLocalDir, Tables}
import graft.operators.EditDistanceJoin
import org.apache.spark.sql.SparkSession

/** Stage-level timing probe for the levenshtein link family (dev tool —
  * not part of the driver contract): times the candidate/verify core
  * alone, the full pair materialization, and the aggregate form, so
  * regressions can be attributed to a stage instead of guessed at.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val c = Tables.customer(spark, sfDir)
    for (_ <- 1 to 2) {
      time("idPairs(core)") {
        EditDistanceJoin.idPairs(c, "c_custkey", "c_name", 2).count()
      }
      time("pairs(full)") {
        EditDistanceJoin.pairs(c, "c_custkey", "c_name", 2).count()
      }
      time("linkedAggregate") {
        EditDistanceJoin.linkedAggregate(c, "c_custkey", "c_name", 2).count()
      }
    }
    spark.stop()
  }
}
