package graft.tools

import graft.GraftLocalDir
import graft.operators.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible measurement for the PPJoin/AllPairs trade-off documented
  * on [[graft.operators.NearDup.jaccardPairsPrefix]]: on a CLEAN corpus
  * the prefix machinery costs more than it saves (the official bench's
  * q_jaccard_prefix measures exactly that), while on a BOILERPLATE-heavy
  * corpus — every document sharing a header/footer paragraph, the
  * web-crawl norm — the hot shingles explode the plain posting join's
  * candidate set (d docs sharing a shingle -> d² candidate rows) but fall
  * OUT of the prefix candidates entirely (prefixes keep each document's
  * RAREST shingles). This probe times both variants on both corpora:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.PrefixDemo"
  *
  * The boilerplate corpus appends one shared 60-token paragraph to every
  * document (threshold 0.8 keeps the output near-dup-sized — with a large
  * shared block, 0.5 would pair every pair of short documents, which is a
  * statement about the corpus, not the join).
  *
  * The MID-SKEW cells (paragraph on 10% / 20% of docs) bracket
  * [[graft.operators.NearDup.JaccardHotKeyFactor]]'s decision boundary
  * from both sides: they are where a wrong factor shows up as a
  * measured mis-route (the factor-32 draft sent M/P = 94 to the
  * 3.7×-slower branch — this sweep is what caught it), and the stat
  * lines print the M/P ratio the dispatcher would see.
  */
object PrefixDemo {
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
    val boiler = (1 to 60).map(i => s"boilerplate$i").mkString(" ")
    val boiled = docs.withColumn("text", concat(col("text"), lit(" " + boiler)))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prefix-demo] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // warm the scan cache so the first measurement isn't charged for IO
    docs.count(); boiled.count()

    time("clean/plain t=0.5") {
      NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("clean/prefix t=0.5") {
      NearDup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("boilerplate/plain t=0.8") {
      NearDup.jaccardPairs(boiled, "doc_id", "text", 3, 0.8).count()
    }
    time("boilerplate/prefix t=0.8") {
      NearDup.jaccardPairsPrefix(boiled, "doc_id", "text", 3, 0.8).count()
    }

    // the jaccardPairsAuto decision statistic on both corpora: candidate
    // mass M = Σ df·(df−1)/2 vs posting count P — the measured regime
    // separation the JaccardHotKeyFactor default is cited to
    def stat(label: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val r = NearDup.shingles(d, "doc_id", "text", 3)
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(sum(col("df")).as("p"),
          sum(col("df").cast("double") * (col("df") - 1L) / 2.0).as("m"))
        .collect()(0)
      println(f"[prefix-demo] $label%-28s postings=${r.getLong(0)}%d " +
        f"candMass=${r.getDouble(1)}%.3e ratio=${r.getDouble(1) / r.getLong(0)}%.1f")
    }
    stat("clean M/P", docs)
    stat("boilerplate M/P", boiled)
    time("clean/auto t=0.5") {
      NearDup.jaccardPairsAuto(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("boilerplate/auto t=0.8") {
      NearDup.jaccardPairsAuto(boiled, "doc_id", "text", 3, 0.8).count()
    }

    // MID-SKEW cells: boilerplate on only a fraction of the corpus —
    // the regimes that land nearest the factor-32 boundary, bracketing
    // it from both sides (does the route the boundary picks actually
    // win there?)
    for (pct <- Seq(10, 20)) {
      val mixed = docs.withColumn("text",
        when(col("doc_id") % 100 < pct, concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))
      mixed.count()
      stat(s"mixed$pct% M/P", mixed)
      time(s"mixed$pct%/plain t=0.8") {
        NearDup.jaccardPairs(mixed, "doc_id", "text", 3, 0.8).count()
      }
      time(s"mixed$pct%/prefix t=0.8") {
        NearDup.jaccardPairsPrefix(mixed, "doc_id", "text", 3, 0.8).count()
      }
      time(s"mixed$pct%/auto t=0.8") {
        NearDup.jaccardPairsAuto(mixed, "doc_id", "text", 3, 0.8).count()
      }
    }
    spark.stop()
  }
}
