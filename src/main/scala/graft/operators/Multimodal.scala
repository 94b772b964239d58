package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as batched per-partition functions.
  *
  * The container has no media codecs, so the decode step is a clearly
  * marked DETERMINISTIC STUB ([[decodeStub]]) — the Spark-side plumbing
  * (binary schema, per-partition batching, metadata projection, chunking)
  * is real and tested. In production the stub body is replaced by an
  * actual codec call; nothing else changes.
  *
  * Scale notes: payload bytes never leave the executor (no collect); the
  * metadata path is a pure codegen projection; `decodeFeatures` is
  * `mapPartitions` — one JVM-local pass, the Scala analog of PySpark's
  * `mapInPandas` batch shape.
  */
object Multimodal {

  val ChunkBytes = 256

  /** Stand-in payload: UTF-8 bytes of the text column (real pipelines read
    * image/audio bytes from parquet binary columns directly).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Typed metadata over the binary payload — length, content hash, chunk
    * count (frame-sample shape), and stub-decoded dimensions. Pure
    * expressions, fully oracle-comparable.
    */
  def metadata(df: DataFrame, idCol: String): DataFrame = {
    val nBytes = length(col("payload")).cast("long")
    // STUB dimensions: deterministic in (first byte, byte length). A real
    // decoder would parse the codec header instead. First BYTE of the
    // binary (hex of the 1-byte slice), not the first character's code
    // point — decodeStub reads payload(0) & 0xff, and the two paths must
    // agree even when the payload starts with multi-byte UTF-8.
    val firstByte =
      coalesce(conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("long"), lit(0L))
    df.select(
      col(idCol),
      nBytes.as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      ceil(nBytes.cast("double") / lit(ChunkBytes.toDouble)).cast("long").as("n_chunks"),
      (lit(16) * (lit(1) + firstByte % 32)).cast("long").as("fake_width"),
      (lit(16) * (lit(1) + nBytes % 32)).cast("long").as("fake_height"))
  }

  /** ========= STUB: replace with a real codec (libjpeg/ffmpeg/...) =========
    * Deterministic fake decode of a payload: (width, height, channels,
    * meanByte). Mirrors [[metadata]]'s dimension formula so the two paths
    * cross-validate.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val first = if (payload.isEmpty) 0 else payload(0) & 0xff
    val width = 16 * (1 + first % 32)
    val height = 16 * (1 + payload.length % 32)
    val mean = if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length
    (width, height, 3, mean)
  }

  /** Frame sampling over the binary payload: every `stride`-th
    * [[ChunkBytes]]-sized chunk becomes one "frame" row with deterministic
    * per-frame features (byte length, first byte, exact byte sum).
    *
    * The chunk==frame interpretation is the STUB part (a real video path
    * swaps the fixed-size slice for codec frame extraction at sampled
    * timestamps); the plumbing is the real shape a 100 TB video pipeline
    * needs and is what this tests: one row per sampled frame via a
    * codegen'd explode — no UDF, payload bytes never leave the executor,
    * and the per-frame feature math is pure expressions (oracle-compared
    * bit-for-bit in q_media_frames).
    */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int = 2): DataFrame = {
    val nChunks = ceil(length(col("payload")).cast("double") / lit(ChunkBytes.toDouble))
      .cast("int")
    df.select(col(idCol), col("payload"), nChunks.as("nc"))
      .filter(col("nc") > 0)
      .select(col(idCol), col("payload"),
        explode(sequence(lit(0), col("nc") - 1, lit(stride))).as("fi"))
      .withColumn("frame",
        expr(s"substring(payload, fi * $ChunkBytes + 1, $ChunkBytes)"))
      .select(
        col(idCol),
        col("fi").cast("long").as("frame_idx"),
        (col("fi").cast("long") * ChunkBytes).as("byte_offset"),
        length(col("frame")).cast("long").as("n_bytes"),
        coalesce(conv(hex(substring(col("frame"), 1, 1)), 16, 10).cast("long"), lit(0L))
          .as("first_byte"),
        expr("aggregate(sequence(1, length(frame)), 0L, " +
          "(acc, i) -> acc + CAST(conv(hex(substring(frame, i, 1)), 16, 10) AS LONG))")
          .as("sum_bytes"))
  }

  /** ========= STUB: replace with a real resampler (libswscale/PIL/...) ====
    * Deterministic fake resize to an outW x outH grid: cell c covers the
    * byte range [floor(c·n/cells), floor((c+1)·n/cells)) and contributes
    * its byte sum, position-weighted into one integer checksum
    * (Σ (c+1)·cellSum — order-sensitive, so any resampling bug moves it).
    * Integer math end to end: bit-identical in the DuckDB oracle.
    */
  def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Long = {
    val cells = outW * outH
    val n = payload.length
    var checksum = 0L
    var c = 0
    while (c < cells) {
      val from = (c.toLong * n / cells).toInt
      val until = ((c + 1).toLong * n / cells).toInt
      var s = 0L
      var i = from
      while (i < until) { s += payload(i) & 0xff; i += 1 }
      checksum += (c + 1L) * s
      c += 1
    }
    checksum
  }

  /** Batched resize via mapPartitions — the pipeline stage after decode
    * (the mapInPandas shape again: one resampler per partition, bytes stay
    * executor-local, output is a fixed-size feature row per doc).
    */
  def resizeFeatures(df: DataFrame, idCol: String,
                     outW: Int = 8, outH: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    in.mapPartitions { it =>
      it.map { case (id, payload) =>
        (id, outW, outH, payload.length.toLong, resizeStub(payload, outW, outH))
      }
    }.toDF(idCol, "out_w", "out_h", "n_bytes", "resize_checksum")
  }

  /** Batched decode via mapPartitions — the Scala analog of a pandas-UDF
    * `mapInPandas` stage: one decoder instantiation per partition, payload
    * bytes stay executor-local.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    in.mapPartitions { it =>
      // per-partition setup (a real decoder would init its codec here)
      it.map { case (id, payload) =>
        val (w, h, c, mean) = decodeStub(payload)
        (id, w, h, c, mean)
      }
    }.toDF(idCol, "width", "height", "channels", "mean_byte")
  }
}
