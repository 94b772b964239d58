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
}
