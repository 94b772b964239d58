package graft.tools

import graft.{GraftLocalDir, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query stage audit (dev scratch): runs named queries and flags
  * long-running LOW-PARALLELISM stages — the signature of an exchange
  * AQE-coalesced to one partition ahead of a fan-out whose cost the
  * input-byte estimate cannot see (the q_pq_search bug: a few KB of raw
  * vectors exploding into ~4M d2 evaluations in a single task). Any
  * stage >= 300 ms on <= 2 tasks is suspicious on a 32-core box.
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val stages =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages.synchronized {
          stages += ((i.stageId,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            i.numTasks))
        }
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let trailing listener events drain
      val sus = stages.synchronized {
        stages.filter(s => s._2 >= 300 && s._3 <= 2).sortBy(-_._2).toList
      }
      val susStr = sus.map(s => f"stage${s._1}:${s._2 / 1000.0}%.1fs/${s._3}t")
        .mkString(" ")
      println(f"[audit] $name%-28s $secs%6.2fs  1task-hot: $susStr")
    }
    spark.stop()
  }
}
