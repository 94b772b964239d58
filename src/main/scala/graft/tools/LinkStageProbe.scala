package graft.tools

import graft.{GraftLocalDir, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer-grained stage attribution for the SymSpell candidate core (dev
  * tool): explosion-only, join-only, and full, at the query setting
  * (maxDist=1) — PerfProbe times the composed operators; this separates
  * the variant-generation UDF cost from the join/distinct cost so
  * optimization effort lands on the real bottleneck.
  */
object LinkStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.EditDistanceJoin
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val c = Tables.customer(spark, sfDir)
    val base = c.select(col("c_custkey").as("id"), col("c_name").as("key"))
    val genVariants = udf((s: String) =>
      if (s == null) Array.empty[String]
      else EditDistanceJoin.deletionVariants(s, 2))
    val variants = base
      .withColumn("__vs", explode(genVariants(col("key"))))
      .withColumn("__v", xxhash64(col("__vs")))
      .drop("__vs")
    for (_ <- 1 to 2) {
      time("variants(explode+hash)") { variants.count() }
      time("join(no distinct)") {
        variants.as("a").hint("shuffle_hash")
          .join(variants.as("b"),
            col("a.__v") === col("b.__v") && col("a.id") < col("b.id") &&
              abs(length(col("a.key")) - length(col("b.key"))) <= 2)
          .filter(levenshtein(col("a.key"), col("b.key"), 2) >= 0)
          .count()
      }
      time("join(no lev, no distinct)") {
        variants.as("a").hint("shuffle_hash")
          .join(variants.as("b"),
            col("a.__v") === col("b.__v") && col("a.id") < col("b.id") &&
              abs(length(col("a.key")) - length(col("b.key"))) <= 2)
          .count()
      }
      time("narrow distinct then verify") {
        val keys = base.select(col("id"), col("key"))
        val cand = variants.as("a").hint("shuffle_hash")
          .join(variants.as("b"),
            col("a.__v") === col("b.__v") && col("a.id") < col("b.id") &&
              abs(length(col("a.key")) - length(col("b.key"))) <= 2)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
        cand
          .join(broadcast(keys.select(col("id").as("id_a"), col("key").as("key_a"))), "id_a")
          .join(broadcast(keys.select(col("id").as("id_b"), col("key").as("key_b"))), "id_b")
          .filter(levenshtein(col("key_a"), col("key_b"), 2) >= 0)
          .count()
      }
      time("idPairs(maxDist=2)") {
        EditDistanceJoin.idPairs(c, "c_custkey", "c_name", 2).count()
      }
    }
    spark.stop()
  }
}
