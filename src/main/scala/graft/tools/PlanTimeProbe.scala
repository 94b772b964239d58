package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Splits a bench attempt's wall into DataFrame construction, physical
  * planning, and execution, per query (dev scratch for the r18
  * optimization round: the PQ/ANN rows showed wall ≈ stage_dur + ~2s and
  * this names where the gap lives). Args: query names.
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.enableOptimizations(spark)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        println(f"[plantime] $name a$i construct=${(t1-t0)/1e9}%6.2fs plan=${(t2-t1)/1e9}%6.2fs exec=${(t3-t2)/1e9}%6.2fs")
      }
    }
    spark.stop()
  }
}
