package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Failures are recorded per query, never swallowed: a crashing query
    // must not read as a fast success that improves the total.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(160))
      }
      name -> ((System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, (v, _)) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => s"\"$k\":${jstr(e)}" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2._2.isDefined)
    val total = results.values.map(_._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
