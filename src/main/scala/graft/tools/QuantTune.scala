package graft.tools

import graft.{GraftLocalDir, Tables}
import graft.operators.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/latency frontier of the two-stage quantized tiers' one knob
  * (dev tool, the PqTune pattern): sweep `candidates` for the SQ8 and
  * sign-bit serves against the exact cosine truth on the fixture
  * corpus, print recall@5 and serve wall per point. This is the
  * measurement behind the tiers' pinned defaults (SQ8 C=20, sign C=50)
  * and their spec floors — retune by re-running this sweep, never by
  * faith. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.QuantTune"
  */
object QuantTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint(true)
    val pred = col("vec_id") % 50 === 0
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding", pred, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[tune] corpus ${emb.count()} vectors, ${exact.size / 5} queries, truth = exact cosine top-5")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val cs = Seq(5, 10, 20, 50, 100, 200)
    val sq8Points = cs.map { c =>
      // warm-up then timed, min-free single point (the sweep's signal is
      // the recall column; wall is indicative only)
      Ann.sq8Search(emb, "vec_id", "embedding", pred, 5, c).count()
      val t0 = System.nanoTime()
      val r = recallOf(Ann.sq8Search(emb, "vec_id", "embedding", pred, 5, c))
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[tune] sq8     C=$c%4d  recall@5 $r%.3f  wall $w%5.2f s")
      (c, r)
    }
    val signPoints = cs.map { c =>
      Ann.hammingSearch(emb, "vec_id", "embedding", pred, 5, c).count()
      val t0 = System.nanoTime()
      val r = recallOf(Ann.hammingSearch(emb, "vec_id", "embedding", pred, 5, c))
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[tune] sign    C=$c%4d  recall@5 $r%.3f  wall $w%5.2f s")
      (c, r)
    }
    // Close the tune→publish loop (round 17): print the publish calls
    // that record THIS sweep's result in the index sidecars, per target
    // floor — the C (and for the sign tier the recall it bought) is a
    // published index parameter the serves default to, so the output of
    // this tool is meant to be pasted into the publish job, not held in
    // someone's head. The sign tier's figure is corpus-dependent — that
    // is exactly why it must ride with the index it was measured on.
    for (floor <- Seq(0.90, 0.95, 0.99)) {
      val sq8C = sq8Points.find(_._2 >= floor).map(_._1)
      val signC = signPoints.find(_._2 >= floor).map(_._1)
      println(f"[tune] floor $floor%.2f: " +
        sq8C.map { c =>
          val r = sq8Points.find(_._1 == c).get._2
          f"writeSq8Index(..., candidates = $c, measuredRecall = Some($r%.2f))"
        }.getOrElse("sq8 UNREACHABLE in sweep") + " ; " +
        signC.map { c =>
          val r = signPoints.find(_._1 == c).get._2
          f"writeSignIndex(..., candidates = $c, measuredRecall = Some($r%.2f))"
        }.getOrElse("sign UNREACHABLE in sweep (raise C past 200)"))
    }
    spark.stop()
  }
}
