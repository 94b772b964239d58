package graft.tools

import graft.{GraftLocalDir, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer-grained stage attribution for the SymSpell candidate core (dev
  * tool): explosion-only, join-only, and full, at the query setting
  * (maxDist=2) — PerfProbe times the composed operators; this separates
  * the variant-generation UDF cost from the join/distinct cost so
  * optimization effort lands on the real bottleneck.
  *
  * Mirrors the PRODUCTION shape of EditDistanceJoin.halfIdPairs: hashes
  * are generated inside the UDF (Array[Long] explode) and the length band
  * compares a precomputed length int, so the exploded rows never carry
  * the key string. The string-explode + xxhash64 variant this probe
  * originally measured was replaced after the comparison showed the
  * narrow rows win (q_link_agg_lev 8.6s -> 6.2s at sf0.1).
  */
object LinkStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
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
    val variants = base
      .withColumn("__len", length(col("key")))
      .select(col("id"), col("__len"),
        explode(graft.functions.deletion_variant_hashes(col("key"), 2))
          .as("__v"))
    def candJoin = variants.as("a").hint("shuffle_hash")
      .join(variants.as("b"),
        col("a.__v") === col("b.__v") && col("a.id") < col("b.id") &&
          abs(col("a.__len") - col("b.__len")) <= 2)
    for (_ <- 1 to 2) {
      time("variants(explode hashes)") { variants.count() }
      time("join(no distinct)") {
        candJoin.count()
      }
      time("narrow distinct then verify") {
        val keys = base.select(col("id"), col("key"))
        val cand = candJoin
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
