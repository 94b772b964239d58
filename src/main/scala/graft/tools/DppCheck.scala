package graft.tools
import graft.{GraftLocalDir, Tables}
import graft.operators.{Ann, IvfFixture, PqFixture}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Pruning evidence for the cell-partitioned PQ layout (dev scratch) —
  * the probe behind [[graft.operators.Ann.writePqIndexByCell]]'s design
  * choice of STATIC cell pruning over Spark's dynamic partition
  * pruning. Prints (a) the scan lines of a probe-bounded serve plan,
  * (b) task-level input bytes for single-query serves across layouts
  * and knob settings. What it measured (round 14): DPP's
  * PartitionPruning rule DID insert a pruning subquery on the code
  * scan, but at AQE runtime PlanAdaptiveDynamicPruningFilters replaced
  * it with dynamicpruningexpression(true) — the ADC join's three-key
  * (cell, j, c) broadcast never matched the pruning subquery's reuse
  * pattern, and non-AQE + reuseBroadcastOnly=false degraded the same
  * way (bytes identical across all knob settings, 108700 for probed-8
  * and exhaustive alike). The static IN filter built from the bounded
  * probed-cell set prunes for real: 8 of 16 files read, plan shows
  * PartitionFilters: [cell IN (...)], PqServeSweep puts the single-
  * query byte cut at 67%.
  */
object DppCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.enableOptimizations(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val dir = java.nio.file.Files.createTempDirectory("dppchk").toString
    Ann.writePqIndexByCell(emb, "vec_id", "embedding", PqFixture.model,
      dir, IvfFixture.model)
    val df = Ann.pqSearchIndexed(emb, "vec_id", "embedding",
      PqFixture.model, col("vec_id") === 0, 5, dir,
      Some(IvfFixture.model), nProbe = 8)
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    planStr.linesIterator.filter(l => l.contains("dynamicpruning") ||
      l.contains("PartitionFilters")).foreach(l => println("[dpp] " + l.trim.take(300)))
    // final-plan scan metrics under AQE (shared walker)
    PlanScans.allScans(df.queryExecution.executedPlan).foreach { s =>
      println(s"[scan] ${s.relation.location.rootPaths.head} " +
        s"numFiles=${s.metrics.get("numFiles").map(_.value)} " +
        s"filesSize=${s.metrics.get("filesSize").map(_.value)} " +
        s"partitions=${s.metrics.get("numPartitions").map(_.value)} " +
        s"staticFiles=${s.metrics.get("staticFilesNum").map(_.value)}")
    }
    // decisive: task-level input bytes for single-query serves
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      })
    def measure(tag: String, np: Int, flat: Boolean): Unit = {
      val d2 = if (flat) { val f = dir + "_flat"
        if (!new java.io.File(f).exists())
          Ann.writePqIndex(emb, "vec_id", "embedding", PqFixture.model, f,
            Some(IvfFixture.model))
        f } else dir
      bytes.set(0)
      Ann.pqSearchIndexed(emb, "vec_id", "embedding", PqFixture.model,
        col("vec_id") === 0, 5, d2, Some(IvfFixture.model), nProbe = np)
        .collect()
      Thread.sleep(800) // drain listener events
      println(s"[bytes] $tag read=${bytes.get()}")
    }
    measure("flat probe8", 8, flat = true)
    measure("cell probe8", 8, flat = false)
    measure("cell exhaustive", Int.MaxValue, flat = false)
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "false")
    measure("cell probe8 reuseOnly=false", 8, flat = false)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    measure("cell probe8 noAQE reuseOnly=false", 8, flat = false)
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "true")
    measure("cell probe8 noAQE reuseOnly=true", 8, flat = false)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
