package graft.tools

import graft.{GraftLocalDir, Tables}
import graft.operators.{ConnectedComponents, EditDistanceJoin}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job-count audit of q_cluster_cc_day2 (dev scratch): the round-13
  * verdict flagged the row's 28 s wall as "~500 sequential fixture-scale
  * jobs" and asked for the actual count and its top contributors —
  * per-job overhead amortizes at real scale, but half a thousand
  * sequential driver round-trips is also a real-cluster scheduling cost
  * worth either cutting or justifying. This replays the query's exact
  * body with each lifecycle phase wrapped in a job group, counting jobs
  * and wall per phase via a listener.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Day2JobAudit"
  */
object Day2JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val jobsByGroup = scala.collection.mutable.Map.empty[String, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobsByGroup.synchronized {
          val g = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
            .getOrElse("(none)")
          jobsByGroup(g) = jobsByGroup.getOrElse(g, 0) + 1
        }
    })
    val phaseWall = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def phase[T](name: String)(body: => T): T = {
      spark.sparkContext.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val r = body
      phaseWall += ((name, (System.nanoTime() - t0) / 1e9))
      spark.sparkContext.clearJobGroup()
      r
    }
    // === the exact q_cluster_cc_day2 body, phase-wrapped ===
    val c = Tables.customer(spark, sfDir)
    def slice(r: Int) = c.filter(col("c_custkey") % 3 === r)
      .select(col("c_custkey"), col("c_name"))
    val day0 = slice(1); val day1 = slice(2); val day2 = slice(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_day2audit")
    val tbl = tmp.getFileName.toString
    phase("day0_publish_varidx") {
      EditDistanceJoin.writeVariantIndexBucketed(day0, "c_custkey",
        "c_name", 1, tmp.toString, tbl)
    }
    val standing0 = phase("day0_cc_run") {
      ConnectedComponents.run(
        day0.select(col("c_custkey").as("id")),
        EditDistanceJoin.idPairs(day0, "c_custkey", "c_name", 1)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
        .localCheckpoint(true)
    }
    def edges(batch: org.apache.spark.sql.DataFrame) =
      EditDistanceJoin.repsAgainstIndexBucketed(
          batch, "c_custkey", "c_name", 1, tbl)
        .select(col("left_id").as("src"), col("right_rep_id").as("dst"))
        .unionByName(
          EditDistanceJoin.idPairs(batch, "c_custkey", "c_name", 1)
            .select(col("id_a").as("src"), col("id_b").as("dst")))
    val standing1 = phase("day1_fold_republish") {
      ConnectedComponents.mergeRepublish(standing0,
          day1.select(col("c_custkey").as("id")), edges(day1))
        .localCheckpoint(true)
    }
    phase("day1_append_varidx") {
      EditDistanceJoin.appendVariantIndexBucketed(day1, "c_custkey",
        "c_name", tbl)
    }
    phase("day2_serve") {
      ConnectedComponents.incrementalAssign(standing1,
          day2.select(col("c_custkey").as("id")), edges(day2))
        .select(col("id").as("c_custkey"), col("component"))
        .write.mode("overwrite").format("noop").save()
    }
    Thread.sleep(500)
    val counts = jobsByGroup.synchronized(jobsByGroup.toMap)
    println(f"${"phase"}%-24s ${"jobs"}%5s ${"wall_s"}%7s")
    phaseWall.foreach { case (name, w) =>
      println(f"$name%-24s ${counts.getOrElse(name, 0)}%5d $w%7.2f")
    }
    println(f"${"TOTAL"}%-24s ${counts.values.sum}%5d " +
      f"${phaseWall.map(_._2).sum}%7.2f  (ungrouped: ${counts.getOrElse("(none)", 0)})")
    Seq("postings", "keys", "members", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_$t"))
    spark.stop()
  }
}
