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
    val variants = Seq(
      (8, 64, true), (16, 16, true), (16, 64, true), (32, 16, true),
      (32, 64, true), (16, 64, false), (32, 64, false))
    variants.foreach { case (m, ks, res) =>
      val coarse = if (res) Some(IvfFixture.model) else None
      val model = Ann.trainPq(emb, "vec_id", "embedding", m = m, ks = ks,
        coarse = coarse)
      val row = Ann.pqRecallEval(emb, "vec_id", "embedding", model,
        col("vec_id") % 50 === 0, 5, coarse).collect()(0)
      println(s"m=$m ks=$ks residual=$res -> n_true=${row.getLong(0)} " +
        s"n_caught=${row.getLong(1)} recall=${row.getDouble(2)}")
    }
    spark.stop()
  }
}
