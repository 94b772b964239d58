package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fault-tolerance wiring: a streaming query stopped and RESTARTED from
  * its checkpoint must pick up exactly where it left off — no loss, no
  * duplication — which is the property a 100 TB ingestion pipeline leans
  * on every time an executor dies or a deploy bounces the job. Driven
  * through the real file source + file sink + checkpoint log (not memory
  * sinks): the sink's commit log is what dedupes a re-attempted batch.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint resumes with no loss and no duplicates") {
    def tmp(tag: String) = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag")
      d.toFile.deleteOnExit(); d.toString
    }
    val src = tmp("src"); val sink = tmp("sink"); val ckpt = tmp("log")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType)))

    def start() = spark.readStream.schema(schema).parquet(src)
      .withColumn("doubled", col("v") * 2)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .start()

    // epoch 1: two files, then a clean stop
    (1L to 5L).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()

    // while "down": more data lands
    (6L to 10L).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)

    // epoch 2: restart from the SAME checkpoint
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val got = spark.read.parquet(sink)
      .select("id", "doubled").as[(Long, Long)].collect().sorted.toSeq
    assert(got == (1L to 10L).map(i => (i, i * 20)).toSeq)
  }

  test("stateful restart: the dedup gate's seen-set survives the checkpoint") {
    // Stronger than the stateless case above: dropDuplicatesWithinWatermark
    // keeps a state store, and a restart that LOST it would re-admit a
    // duplicate arriving after the bounce — the exact corruption a
    // long-running ingest gate cannot afford.
    def tmp(tag: String) = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag")
      d.toFile.deleteOnExit(); d.toString
    }
    val src = tmp("dsrc"); val sink = tmp("dsink"); val ckpt = tmp("dlog")
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("doc_id", LongType), StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    def start() = graft.operators.Dedup.byFingerprintStream(
        spark.readStream.schema(schema).parquet(src), "text", "ts", "1 hour")
      .select("doc_id", "fp")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .start()

    // epoch 1: two distinct docs, then a clean stop
    Seq((ts("2026-01-01 10:00:00"), 1L, "alpha text"),
        (ts("2026-01-01 10:00:01"), 2L, "beta text"))
      .toDF("ts", "doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()

    // while "down": a re-post of doc 1's content (same fingerprint,
    // inside the watermark window) plus a genuinely new doc
    Seq((ts("2026-01-01 10:05:00"), 3L, "ALPHA  TEXT"),
        (ts("2026-01-01 10:05:01"), 4L, "gamma text"))
      .toDF("ts", "doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)

    // epoch 2: restart from the SAME checkpoint — restored state must
    // suppress the re-post
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val got = spark.read.parquet(sink)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 4L), s"got $got")
  }
}
