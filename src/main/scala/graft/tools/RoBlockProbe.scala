package graft.tools

import graft.{GraftLocalDir, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the blocked RO join (dev scratch), two sections:
  *
  *  1. filter effectiveness on the supplier fixture: candidate pairs
  *     surviving prefix filter + length band vs all pairs vs verified —
  *     the numbers quoted in Linker.similarityPairsBlocked's Scaladoc
  *     (SPARK_GRAFT_SF_DIR selects the fixture, default sf0.01);
  *
  *  2. the honest trade vs the faithful BNLJ on a DIVERSE corpus
  *     (2000 deterministic three-word names from a 40-word vocabulary,
  *     where most pairs fall below the threshold — the realistic name-
  *     corpus shape): wall time of both strategies + equality of pair
  *     counts. The supplier fixture is the opposite extreme (every pair
  *     is a true >= 80 pair), where blocking cannot prune anything.
  */
object RoBlockProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Linker}

    val dedup = Dedup.exact(Tables.supplier(spark, sfDir), Seq("s_name"))
    val n = dedup.select(countDistinct(col("s_name"))).head.getLong(0)
    val cand = Linker.roBlockCandidates(dedup, "s_name", 80.0).count()
    val verified = Linker.similarityPairsBlocked(dedup, "s_name", 80.0).count() / 2
    val all = n * (n - 1) / 2
    println(f"[roblock] supplier: n=$n allPairs=$all candidates=$cand " +
      f"(${100.0 * cand / all}%.1f%%) verified=$verified")

    // Diverse corpus: three pseudo-words per name, deterministic in id.
    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
      "victor", "whiskey", "xray", "yankee", "zulu", "amber", "birch",
      "cedar", "dune", "ember", "fjord", "grove", "harbor", "isle",
      "juniper", "knoll", "lagoon", "mesa", "nimbus")
    val vcol = array(vocab.map(lit): _*)
    val diverse = spark.range(2000).select(
      concat_ws(" ",
        element_at(vcol, (col("id") % 40 + 1).cast("int")),
        element_at(vcol, (col("id") / 7 % 40 + 1).cast("int")),
        element_at(vcol, (col("id") / 191 % 40 + 1).cast("int")),
        (col("id") % 13).cast("string")).as("name"))
    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[roblock] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  pairs=$r")
      r
    }
    val prefixCand = Linker.roBlockCandidates(diverse, "name", 80.0,
      countFilter = false).count()
    val survivors = Linker.roBlockCandidates(diverse, "name", 80.0).count()
    val allDiverse = 2000L * 1999 / 2
    println(f"[roblock] diverse: prefix candidates=$prefixCand -> " +
      f"count-filter survivors=$survivors " +
      f"(${100.0 * survivors / allDiverse}%.1f%% of ${allDiverse} pairs " +
      "reach the difflib verify)")
    for (_ <- 1 to 2) {
      val b = time("diverse blocked") {
        Linker.similarityPairsBlocked(diverse, "name", 80.0).count()
      }
      val nv = time("diverse bnlj") {
        Linker.similarityPairs(diverse, "name", None, 80.0).count()
      }
      require(b == nv, s"pair sets disagree: blocked=$b naive=$nv")
    }
    spark.stop()
  }
}
