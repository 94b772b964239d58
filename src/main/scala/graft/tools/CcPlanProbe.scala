package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = (1L to 2000L).map(i => (i, math.max(i/2, 1L))).toDF("src","dst")
    var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })
    // one round, calling the REAL star steps (private[graft] since round
    // 19) so the probe's plan evidence cannot drift from the shipped code
    val e0 = edges.select(greatest(col("src"),col("dst")).as("src"),
        least(col("src"),col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(false)
    val round = graft.operators.ConnectedComponents.smallStar(
      graft.operators.ConnectedComponents.largeStar(e0))
    round.write.format("noop").mode("overwrite").save()
    println("[probe] one-round executed plan:")
    println(round.queryExecution.executedPlan.toString.take(6000))
    println(s"[probe] jobs for one round: $jobs")
    spark.stop()
  }
}
