package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as batched per-partition functions.
  *
  * The decode step is REAL for image payloads: `javax.imageio` ships
  * PNG/BMP/GIF codecs inside the JDK, so [[decodeImage]] parses actual
  * image bytes (dimensions, band count, pixel mean) with no external
  * dependency, and [[imagePayloads]] generates deterministic PNGs to feed
  * it (the sandbox stand-in for reading real image bytes out of a parquet
  * binary column). Non-image payloads fall back to the clearly marked
  * DETERMINISTIC STUB ([[decodeStub]]) — the no-codec stand-in for
  * audio/video formats the JDK cannot parse; swapping it for an ffmpeg
  * call changes nothing else in the plumbing.
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

  /** Deterministic per-id PNG: width = 1 + id%13, height = 1 + id%7,
    * RGB with every channel of pixel (x, y) set to (id + 31x + 17y) % 256.
    * PNG is lossless, so however the encoder compresses, the DECODED
    * pixels equal this formula — which is what lets q_media_decode carry a
    * DuckDB oracle over a real codec path: the oracle recomputes
    * dimensions and pixel mean from the formula, the Spark side has to
    * actually parse the PNG to reproduce them.
    */
  def makePng(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(makeImage(id), "png", out)
    out.toByteArray
  }

  /** The shared formula image behind [[makePng]] / [[makeJpeg]]:
    * width = 1 + id%13, height = 1 + id%7, RGB with every channel of
    * pixel (x, y) set to (id + 31x + 17y) % 256.
    */
  private def makeImage(id: Long): java.awt.image.BufferedImage = {
    val w = (1 + id % 13).toInt
    val h = (1 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id + 31L * x + 17L * y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The same formula image JPEG-encoded (the JDK ships a JPEG codec
    * next to PNG/BMP/GIF). JPEG is LOSSY, so — unlike PNG — decoded
    * samples only approximate the formula: the closed-form DuckDB
    * oracle of q_media_decode / q_image_neardup cannot cover JPEG
    * payloads, and the cross-codec contract lives in MultimodalSpec
    * instead (real decode asserted against the stub-impossible
    * dimensions; dHash of the JPEG within the Hamming band of the same
    * image's PNG — the codec-robustness property dHash exists for).
    */
  def makeJpeg(id: Long, quality: Float = 0.95f): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(makeImage(id), null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** (id, payload) with a real PNG per row — the image-corpus stand-in
    * (a production pipeline reads the bytes from a parquet binary column
    * instead; generation is a mapPartitions batch like decode, bytes never
    * leave the executor).
    */
  def imagePayloads(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        // no temp-file cache for the in-memory streams (per-partition init)
        javax.imageio.ImageIO.setUseCache(false)
        it.map(id => (id, makePng(id)))
      }.toDF(idCol, "payload")
  }

  /** REAL image decode via the JDK's built-in codecs (PNG/BMP/GIF):
    * (width, height, bands, mean over every sample of every band), or
    * None when the payload is not a decodable image.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double)] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val r = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { s += r.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        (w, h, bands, s.toDouble / (w.toLong * h * bands))
      }
      // NonFatal, not just IOException: the JDK codecs throw runtime
      // exceptions (IndexOutOfBounds/IllegalArgument/CMMException) on
      // payloads that match a magic number but are truncated/corrupt —
      // those must take the stub fallback, not kill the task.
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 60-bit difference hash (dHash) over a sampled grayscale grid — the
    * image-content analog of the text SimHash: visually-similar images
    * land within a small Hamming distance, so candidate pairs come from
    * [[NearDup.simhashPairs]]' 10-bit pigeonhole chunk join UNCHANGED
    * (60 bits = 6 chunks is exactly that machinery's shape; a Hamming-k
    * pair with k < 6 must agree on some chunk).
    *
    * The grid is 6 rows x 11 sample columns -> 10 horizontal-gradient
    * bits per row (bit gy*10+gx = sample(x(gx+1), y(gy)) > sample(x(gx),
    * y(gy))). Sampling is NEAREST-NEIGHBOR at integer coordinates
    * (x = gx*w/11, y = gy*h/6) rather than area-averaged: deterministic
    * for any w x h (including images smaller than the grid, which
    * up-sample by repetition), and — because PNG decode is lossless —
    * exactly replayable from the generator's closed-form pixel formula,
    * which is what lets q_image_neardup carry a full DuckDB oracle over a
    * real codec path with no frozen fixture. Gradient bits are contrast-
    * and brightness-shift tolerant in the usual dHash sense.
    */
  def dHash60(sample: (Int, Int) => Int, w: Int, h: Int): Long = {
    var hash = 0L
    var gy = 0
    while (gy < 6) {
      val y = gy * h / 6
      var gx = 0
      while (gx < 10) {
        val x0 = gx * w / 11
        val x1 = (gx + 1) * w / 11
        if (sample(x1, y) > sample(x0, y)) hash |= 1L << (gy * 10 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** [[dHash60]] of a REAL decoded image payload (JDK codecs), grayscaled
    * as the integer mean across bands; None when the payload doesn't
    * decode (same NonFatal contract as [[decodeImage]]).
    */
  def imageDHash(payload: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val r = img.getRaster
        val bands = r.getNumBands
        dHash60((x, y) => {
          var s = 0
          var b = 0
          while (b < bands) { s += r.getSample(x, y, b); b += 1 }
          s / bands
        }, img.getWidth, img.getHeight)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (id, simhash) per decodable image payload — column names match
    * [[NearDup.simhashPairs]]' contract so the Hamming-band pair search
    * is shared verbatim. Non-decodable payloads are DROPPED (they have no
    * visual content to near-dup; route them through [[decodeFeatures]]'
    * stub path instead). Same mapPartitions batch shape as decode: bytes
    * never leave the executor, one codec setup per partition.
    */
  def imageHashes(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, payload) => imageDHash(payload).map((id, _)) }
      }.toDF("id", "simhash")
  }

  /** ========= STUB: replace with a real codec (libjpeg/ffmpeg/...) =========
    * Deterministic fake decode of a NON-IMAGE payload: (width, height,
    * channels, meanByte). Mirrors [[metadata]]'s dimension formula so the
    * two paths cross-validate.
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

  /** Cross-item frame-level near-dup — the video/audio dedup shape: two
    * payloads are candidate duplicates when they SHARE sampled frames
    * (identical frame bytes here; a real pipeline first reduces each frame
    * to a perceptual hash — [[dHash60]] for stills — and this join is
    * unchanged). A posting equi-join on the frame content hash, never
    * payload × payload; the frame set is distinct per item (set semantics)
    * and a frequency guard drops ubiquitous frames (intros / silence /
    * black frames — the hot-key flood every posting join must bound)
    * before the pair join, the shinglesWithSkewGuard pattern applied to
    * media. md5 narrows the shuffle key to 32 hex chars; the oracle joins
    * on the exact frame bytes, so a (cosmically unlikely) md5 collision
    * would surface as a hash mismatch rather than hide.
    *
    * Expects a `payload` binary column ([[withPayload]] or a real binary
    * read); sampling matches [[sampleFrames]] (every `stride`-th
    * [[ChunkBytes]] slice). Output: (id_a, id_b, n_shared), id_a < id_b.
    */
  def sharedFramePairs(df: DataFrame, idCol: String, stride: Int = 2,
                       minShared: Long = 1,
                       maxDocsPerFrame: Long = 50): DataFrame = {
    val nChunks = ceil(length(col("payload")).cast("double") / lit(ChunkBytes.toDouble))
      .cast("int")
    // the posting table feeds three consumers (hot-set aggregate + both
    // sides of the pair join) — materialize the chunk+md5 transform ONCE
    // (same localCheckpoint tradeoff as NearDup.shinglesWithSkewGuard,
    // documented there)
    val frames = df
      .select(col(idCol).as("__id"), col("payload"), nChunks.as("nc"))
      .filter(col("nc") > 0)
      .select(col("__id"), col("payload"),
        explode(sequence(lit(0), col("nc") - 1, lit(stride))).as("fi"))
      .select(col("__id"),
        md5(expr(s"substring(payload, fi * $ChunkBytes + 1, $ChunkBytes)")).as("h"))
      .distinct()
      .localCheckpoint(true)
    // guard via the HOT set (tiny by definition) as a broadcast ANTI
    // join — joining the complement ("rare") instead would broadcast a
    // corpus-sized hash set (measured: AQE picks exactly that plan)
    val hot = frames.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDocsPerFrame).select("h")
    val kept = frames.join(broadcast(hot), Seq("h"), "left_anti")
    // shuffle_hash pin, as in NearDup.lshCandidates: both sides derive
    // from an explode, whose size estimate under-reports at scale — an
    // AQE/CBO broadcast of a corpus-sized posting table is the plan this
    // hint exists to prevent.
    kept.as("a").hint("shuffle_hash").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id"), col("b.__id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("n_shared"))
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
    * bytes stay executor-local. Image payloads are REALLY decoded
    * ([[decodeImage]] — JDK codecs); non-image payloads take the declared
    * stub fallback.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    in.mapPartitions { it =>
      // per-partition codec setup: in-memory streams only
      javax.imageio.ImageIO.setUseCache(false)
      it.map { case (id, payload) =>
        val (w, h, c, mean) = decodeImage(payload).getOrElse(decodeStub(payload))
        (id, w, h, c, mean)
      }
    }.toDF(idCol, "width", "height", "channels", "mean_byte")
  }
}
