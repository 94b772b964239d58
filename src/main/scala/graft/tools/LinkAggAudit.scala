package graft.tools

import graft.{GraftLocalDir, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off deep audit (dev scratch) for the q_link_agg_lev cost question
  * (round-10 verdict item #1): prints EVERY stage of the named queries
  * with name, wall time, task count, and record counts, so the ~2 s
  * one-task stages StageAudit flags can be attributed to a plan node
  * rather than guessed at.
  */
object LinkAggAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Int, String, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val in = i.taskMetrics.inputMetrics.recordsRead +
          i.taskMetrics.shuffleReadMetrics.recordsRead
        val out = i.taskMetrics.shuffleWriteMetrics.recordsWritten
        stages.synchronized {
          stages += ((i.stageId,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            i.numTasks, i.name.takeWhile(_ != '\n'), in, out))
        }
      }
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("q_link_agg_lev")
    names.foreach { name =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name  total=$secs%.2f s ==")
      stages.synchronized {
        stages.sortBy(-_._2).foreach { case (id, ms, nt, nm, in, out) =>
          println(f"  stage$id%-4d ${ms / 1000.0}%6.2fs ${nt}%3dt in=$in%-9d out=$out%-9d $nm")
        }
      }
    }
    spark.stop()
  }
}
