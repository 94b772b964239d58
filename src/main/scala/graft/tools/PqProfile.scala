package graft.tools

import graft.GraftLocalDir
import graft.operators.{Ann, IvfFixture, PqFixture}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the IVFPQ search path (dev scratch). */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[pqprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    emb.count()
    time("encode.count") {
      Ann.pqEncode(emb, "vec_id", "embedding", PqFixture.model,
        Some(IvfFixture.model)).count()
    }
    time("encode.agg(sum c0)") {
      Ann.pqEncode(emb, "vec_id", "embedding", PqFixture.model,
        Some(IvfFixture.model)).agg(sum("c0")).collect(); 1L
    }
    time("codeLong.count") {
      Ann.pqEncode(emb, "vec_id", "embedding", PqFixture.model,
          Some(IvfFixture.model))
        .select(col("vec_id"), col("cell"),
          posexplode(array((0 until 32).map(j => col(s"c$j")): _*))
            .as(Seq("j", "c")))
        .count()
    }
    time("codeLong.groupCount") {
      Ann.pqEncode(emb, "vec_id", "embedding", PqFixture.model,
          Some(IvfFixture.model))
        .select(col("vec_id"), col("cell"),
          posexplode(array((0 until 32).map(j => col(s"c$j")): _*))
            .as(Seq("j", "c")))
        .groupBy("cell", "j", "c").count().count()
    }
    time("search.full") {
      Ann.pqSearch(emb, "vec_id", "embedding", PqFixture.model,
        col("vec_id") % 50 === 0, 5, Some(IvfFixture.model)).count()
    }
    time("search.full2") {
      Ann.pqSearch(emb, "vec_id", "embedding", PqFixture.model,
        col("vec_id") % 50 === 0, 5, Some(IvfFixture.model)).count()
    }
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks, i.name))
      }
    })
    val df = Ann.pqSearch(emb, "vec_id", "embedding", PqFixture.model,
      col("vec_id") % 50 === 0, 5, Some(IvfFixture.model))
    df.count()
    Thread.sleep(1000)
    stages.sortBy(-_._2).take(8).foreach { case (id, ms, nt, nm) =>
      println(f"[pqstage] stage=$id%4d  ${ms / 1000.0}%7.2fs  tasks=$nt  ${nm.take(90)}")
    }
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0).linesIterator.take(60).mkString("\n"))
    spark.stop()
  }
}
