package graft.tools

import graft.{GraftLocalDir, Tables}
import graft.operators.{Ann, IvfFixture, PqFixture}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot recall readout for the PROBE-BOUNDED IVFPQ serving point
  * (dev scratch): q_pq_probe serves nProbe=8 of 16 cells (4 was
  * rejected at 0.70 recall — this probe's own round-12 curve:
  * 2→0.58, 4→0.70, 8→0.86, 16→1.00), and AnnSpec pins the 0.80
  * recall@5 floor at that point — this prints the full curve on the
  * sf0.01 fixture so the pin stays set from a measurement, not an
  * assumption.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    Seq(2, 4, 8, 16).foreach { np =>
      val r = Ann.pqRecallEval(emb, "vec_id", "embedding", PqFixture.model,
        col("vec_id") % 50 === 0, 5, Some(IvfFixture.model), nProbe = np)
        .collect()(0)
      println(f"[proberecall] nProbe=$np%2d recall@5=${r.getDouble(2)}%.4f")
    }
    spark.stop()
  }
}
