package graft.tools
import graft.operators.{ConnectedComponents, EditDistanceJoin, Linker}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", graft.GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
      .filter(col("c_custkey") % 3 === 0)
    cust.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[tc] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    time("truth")(EditDistanceJoin.idPairs(cust, "c_custkey", "c_name", 2).count())
    val passes = Seq(col("c_name"), reverse(col("c_name")),
      concat_ws("", sort_array(split(col("c_name"), ""))))
    time("union3")(Linker.sortedNeighborhoodMulti(cust, "c_custkey", "c_name", passes, 10, 2).count())
    val union = Linker.sortedNeighborhoodMulti(cust, "c_custkey", "c_name", passes, 10, 2)
      .select(col("id_a").cast("long"), col("id_b").cast("long")).localCheckpoint(true)
    val edges = union.select(col("id_a").as("src"), col("id_b").as("dst"))
    val verts = edges.select(col("src").as("id")).unionByName(edges.select(col("dst").as("id"))).distinct()
    time("cc")(ConnectedComponents.run(verts, edges).count())
    time("full")(Linker.sortedNeighborhoodTcRecall(cust, "c_custkey", "c_name", passes, 10, 2).count())
    spark.stop()
  }
}
