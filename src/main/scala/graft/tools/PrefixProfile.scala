package graft.tools

import graft.GraftLocalDir
import graft.operators.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the prefix-filtered Jaccard join (dev scratch). */
object PrefixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[pfx] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("shingles.scan")(NearDup.shingles(docs, "doc_id", "text", 3).count())
    val sh = NearDup.shingles(docs, "doc_id", "text", 3)
    time("shingles.checkpoint") { val c = sh.localCheckpoint(true); c.count() }
    val shc = sh.localCheckpoint(true)
    time("dfreq")(shc.groupBy("shingle").agg(count(lit(1)).as("df")).count())
    time("counts")(shc.groupBy("id").agg(count(lit(1)).as("n")).count())
    val dfreq = shc.groupBy("shingle").agg(count(lit(1)).as("df"))
    val counts = shc.groupBy("id").agg(count(lit(1)).as("n"))
    val withLim = shc.join(dfreq, "shingle").join(counts, "id")
      .withColumn("klim", (col("n") - ceil(lit(0.5) * col("n")) + 1L).cast("long"))
    time("withLim")(withLim.count())
    val maxK = counts.agg(max((col("n") - ceil(lit(0.5) * col("n")) + 1L)))
      .collect()(0).getLong(0)
    val prefix = graft.plans.TopKPerKey.topKPerKey(withLim, Seq("id"),
        Seq(("df", true), ("shingle", true)), maxK.toInt, "rn")
      .filter(col("rn") <= col("klim")).select("id", "shingle")
    time("prefix.topk")(prefix.count())
    val cand = prefix.as("a").hint("shuffle_hash").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("cand")(cand.count())
    time("full.op")(NearDup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())
    time("full.plain")(NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
