package graft.tools

import graft.{GraftLocalDir, Tables}
import graft.operators.{Ann, IvfFixture, PqFixture}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-size sweep behind [[Ann.pqSearchAuto]]'s exhaustive/probed
  * crossover (dev tool): replicate the sf0.1 embeddings Rx (vec_ids
  * offset, query sample held FIXED at the base corpus's %50 slice so
  * only the corpus side grows) and time the exhaustive ADC scan vs the
  * nProbe=8 bounded serve on the frozen fixtures, min-of-2 after a
  * warm-up. Both forms scan all codes (the LUT join drops unprobed
  * cells AFTER the scan — see pqSearchWith; at cluster scale the
  * standing codes partition by cell so the probe prunes the scan
  * itself), so the expected shape is two linear curves with the probed
  * one ~nProbe/nCells cheaper in joined rows — the sweep measures where
  * the exhaustive form's recall-1.0 premium stops being noise.
  *
  *   sbt "runMain graft.tools.PqServeSweep"
  */
object PqServeSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n0 = base.count()
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < n0
    def replicate(r: Int): DataFrame =
      if (r == 1) base
      else base.crossJoin(
          spark.range(r).select(col("id").as("__rep")))
        .select((col("vec_id") + col("__rep") * lit(n0)).as("vec_id"),
          col("embedding"), col("label"))
    def time(f: => Unit): Double = {
      f
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    // serve from a PUBLISHED code index per size — the fused form's
    // corpus re-encode is identical under both nProbe settings and
    // would drown the serve delta the sweep exists to measure
    println(f"${"corpus"}%8s ${"exhaustive_s"}%13s ${"probed8_s"}%10s ${"ratio"}%6s")
    Seq(1, 10, 50).foreach { r =>
      val emb = replicate(r).localCheckpoint(true)
      val n = emb.count()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pqsweep_$r").toString
      Ann.writePqIndex(emb, "vec_id", "embedding", PqFixture.model, dir,
        Some(IvfFixture.model))
      def serve(np: Int): Double = time(
        Ann.pqSearchIndexed(emb, "vec_id", "embedding", PqFixture.model,
            pred, 5, dir, Some(IvfFixture.model), nProbe = np)
          .write.mode("overwrite").format("noop").save())
      val ex = serve(Int.MaxValue)
      val pr = serve(8)
      println(f"$n%8d $ex%13.2f $pr%10.2f ${ex / pr}%6.2f")
      emb.unpersist()
    }
    spark.stop()
  }
}
