package graft.tools

import graft.{GraftLocalDir, Tables}
import graft.operators.{Ann, IvfFixture}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** (nProbe, C) recall sweep for the IVF-SQ8 tier (dev tool, the
  * QuantTune pattern): the tier's recall loss decomposes into routing
  * (probe misses) and the within-cell candidate cut — this prices both
  * knobs against the exact cosine truth so the pinned serving point is
  * measured, never guessed.
  */
object IvfSq8Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enableOptimizations(spark)
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint(true)
    val pred = col("vec_id") % 50 === 0
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfsq8t").toString
    Ann.writeSq8IndexByCell(emb, "vec_id", "embedding", dir, IvfFixture.model)
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding", pred, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[tune] corpus ${emb.count()} vectors, ${exact.size / 5} queries")
    for (np <- Seq(6, 8, 10, 12, 16); c <- Seq(20, 50)) {
      val got = Ann.sq8SearchByCell(emb, "vec_id", "embedding", pred, 5,
          dir, IvfFixture.model, nProbe = np, candidates = c)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val r = (exact & got).size.toDouble / exact.size
      println(f"[tune] ivfsq8 nProbe=$np%2d C=$c%3d  recall@5 $r%.3f")
    }
    // Planned stage-1 I/O of ONE pinned query (the DppCheck method:
    // FileSourceScanExec numFiles/filesSize off the EXECUTED plan — the
    // static pruning claim measured, not asserted): probed vs all-cells.
    val queryId = emb.agg(min(col("vec_id"))).first().getLong(0)
    def scanOf(np: Int): (Long, Double) = {
      val df = Ann.sq8SearchByCell(emb, "vec_id", "embedding",
        col("vec_id") === queryId, 5, dir, IvfFixture.model, nProbe = np)
      df.collect() // collect, not count: metrics live on THIS plan
      val (nf, bytes) = PlanScans.scanOf(df, "codes")
      (nf, bytes / 1e3)
    }
    val (f8, kb8) = scanOf(8)
    val (fAll, kbAll) = scanOf(IvfFixture.model.centroids.length)
    println(f"[tune] ivfsq8 stage-1 scan: probed8 $f8%3d files $kb8%8.1f KB " +
      f"vs all-cells $fAll%3d files $kbAll%8.1f KB  byte_cut=${1 - kb8 / kbAll}%5.2f")
    spark.stop()
  }
}
