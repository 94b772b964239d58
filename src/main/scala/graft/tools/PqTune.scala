package graft.tools

import graft.GraftLocalDir
import graft.operators.{Ann, IvfFixture}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** PQ configuration sweep: trains (m, ks, raw-vs-residual) variants on
  * the sf0.01 embeddings and prints the recall@5 audit for each — the
  * measure-then-freeze step behind FreezePq's chosen configuration
  * (never tune by guessing; the audit is the decider).
  *
  * Round 11 extends the sweep into a recall/LATENCY frontier: each
  * variant also times the exhaustive pqSearch serve (min of 2 after a
  * warm-up) and the nProbe dimension is swept on the recall-leading
  * configs — the table a serving owner reads to pick the production
  * point (recall floor first, then cheapest latency that clears it).
  *
  *   sbt "runMain graft.tools.PqTune /root/testdata/sf0.01"
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pred = col("vec_id") % 50 === 0
    def timeServe(f: => Unit): Double = {
      f // warm codegen/JIT
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    // (m, ks, residual, nProbes to sweep) — nProbe 16 = all cells on the
    // 16-cell fixture quantizer, i.e. the exhaustive ADC scan.
    val variants = Seq(
      (8, 64, true, Seq(16)), (16, 16, true, Seq(16)),
      (16, 64, true, Seq(16)), (32, 16, true, Seq(16)),
      (32, 64, true, Seq(4, 8, 16)), (16, 64, false, Seq(16)),
      (32, 64, false, Seq(16)), (16, 256, true, Seq(16)),
      (32, 256, true, Seq(4, 8, 16)), (64, 64, true, Seq(4, 8, 16)),
      (64, 256, true, Seq(4, 8, 16)))
    println(f"${"m"}%3s ${"ks"}%4s ${"res"}%5s ${"nProbe"}%6s " +
      f"${"recall@5"}%9s ${"serve_s"}%8s")
    variants.foreach { case (m, ks, res, nProbes) =>
      val coarse = if (res) Some(IvfFixture.model) else None
      val model = Ann.trainPq(emb, "vec_id", "embedding", m = m, ks = ks,
        coarse = coarse)
      nProbes.foreach { np =>
        val row = Ann.pqRecallEval(emb, "vec_id", "embedding", model,
          pred, 5, coarse, np).collect()(0)
        val serve = timeServe(
          Ann.pqSearch(emb, "vec_id", "embedding", model, pred, 5, coarse,
            np).write.mode("overwrite").format("noop").save())
        println(f"$m%3d $ks%4d $res%5s $np%6d " +
          f"${row.getDouble(2)}%9.3f $serve%8.2f")
      }
    }
    spark.stop()
  }
}
