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
    // one round, replicated inline (largeStar/smallStar are private)
    val e0 = edges.select(greatest(col("src"),col("dst")).as("src"),
        least(col("src"),col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(false)
    def largeStar(e: org.apache.spark.sql.DataFrame) = {
      val sym = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
      val m = sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      sym.join(m, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(m.select(col("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
    }
    def smallStar(e: org.apache.spark.sql.DataFrame) = {
      val dir = e.repartition(col("src"))
      val m = dir.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), col("mn").as("m"))
      dir.join(m, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(m.select(col("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
    }
    val round = smallStar(largeStar(e0))
    round.write.format("noop").mode("overwrite").save()
    println("[probe] one-round executed plan:")
    println(round.queryExecution.executedPlan.toString.take(6000))
    println(s"[probe] jobs for one round: $jobs")
    spark.stop()
  }
}
