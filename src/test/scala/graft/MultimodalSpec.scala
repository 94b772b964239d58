package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // doc 4 starts with a multi-byte UTF-8 char (é = 0xC3 0xA9): the
  // expression path must read the first BYTE (0xC3), not the code point.
  private lazy val docs = Multimodal.withPayload(
    Seq((1L, "hello world"), (2L, "x" * 600), (3L, ""), (4L, "état"))
      .toDF("doc_id", "text"), "text")

  test("payload is utf-8 bytes; metadata projects length/hash/chunks") {
    val m = Multimodal.metadata(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_bytes") == 11L)
    assert(m(1L).getAs[String]("sha256") ==
      // sha256("hello world"), well-known value
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(m(1L).getAs[Long]("n_chunks") == 1L)
    assert(m(2L).getAs[Long]("n_chunks") == 3L)   // 600/256 -> 3
    assert(m(3L).getAs[Long]("n_bytes") == 0L && m(3L).getAs[Long]("n_chunks") == 0L)
  }

  test("mapPartitions decode path agrees with the expression path") {
    val meta = Multimodal.metadata(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("fake_width"), r.getAs[Long]("fake_height"))).toMap
    val dec = Multimodal.decodeFeatures(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("width").toLong, r.getAs[Int]("height").toLong)).toMap
    assert(dec == meta)
    assert(meta(4L)._1 == 16L * (1 + 0xc3 % 32))  // first byte of é, not the code point
  }

  test("sampleFrames emits every 2nd chunk with exact byte features") {
    val f = Multimodal.sampleFrames(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("frame_idx")) -> r).toMap
    // doc 2 = 600 bytes of 'x' -> 3 chunks, stride 2 samples frames 0 and 2
    assert(f.keySet.filter(_._1 == 2L) == Set((2L, 0L), (2L, 2L)))
    assert(f((2L, 0L)).getAs[Long]("n_bytes") == 256L)
    assert(f((2L, 0L)).getAs[Long]("sum_bytes") == 256L * 'x'.toLong)
    assert(f((2L, 2L)).getAs[Long]("n_bytes") == 88L)      // 600 - 512
    assert(f((2L, 2L)).getAs[Long]("byte_offset") == 512L)
    // doc 1 = "hello world": one frame, sum over the 11 ascii bytes
    assert(f((1L, 0L)).getAs[Long]("sum_bytes") ==
      "hello world".getBytes("UTF-8").map(_.toLong).sum)
    assert(f((1L, 0L)).getAs[Long]("first_byte") == 'h'.toLong)
    // doc 3 is empty -> no frames; doc 4 starts with 0xC3 (é)
    assert(!f.keySet.exists(_._1 == 3L))
    assert(f((4L, 0L)).getAs[Long]("first_byte") == 0xC3L)
  }

  test("resizeStub partitions every byte into exactly one cell") {
    // checksum with all-equal weights == total byte sum scaled: use a
    // payload where cells are distinguishable instead
    val p = (0 until 100).map(_.toByte).toArray
    val ck = Multimodal.resizeStub(p, 8, 8)
    // independent reference computation
    val cells = 64
    val expected = (0 until cells).map { c =>
      val from = c * p.length / cells; val until = (c + 1) * p.length / cells
      (c + 1L) * (from until until).map(i => (p(i) & 0xff).toLong).sum
    }.sum
    assert(ck == expected)
    assert(Multimodal.resizeStub(Array.emptyByteArray, 8, 8) == 0L)
  }

  test("resizeFeatures runs batched and matches the direct stub") {
    val out = Multimodal.resizeFeatures(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("resize_checksum")).toMap
    val direct = docs.select($"doc_id", $"payload").collect()
      .map(r => r.getLong(0) ->
        Multimodal.resizeStub(r.getAs[Array[Byte]]("payload"), 8, 8)).toMap
    assert(out == direct)
    assert(out(3L) == 0L)  // empty payload
  }

  test("real PNG roundtrip: decode recovers the generating formula") {
    for (id <- Seq(0L, 1L, 12L, 13L, 97L)) {
      val png = Multimodal.makePng(id)
      // actual PNG magic bytes
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val Some((w, h, c, mean)) = Multimodal.decodeImage(png)
      assert(w == (1 + id % 13).toInt && h == (1 + id % 7).toInt && c == 3)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield ((id + 31L * x + 17L * y) % 256).toDouble).sum / (w * h)
      assert(mean == expected, s"id $id")
    }
  }

  test("decodeFeatures really decodes image payloads and stubs the rest") {
    val imgs = Multimodal.imagePayloads(
      Seq((5L, "a"), (20L, "b")).toDF("doc_id", "text"), "doc_id")
    val dec = Multimodal.decodeFeatures(imgs, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(dec(5L) == ((6, 6, 3)) && dec(20L) == ((8, 7, 3)))
    // text payloads are not decodable images -> stub fallback
    val stubbed = Multimodal.decodeFeatures(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stubbed(1L) == 16 * (1 + 'h' % 32))
  }

  test("imageDHash equals the closed-form replay of the generator formula") {
    // Scala replay of the oracle's SQL: nearest-neighbor sample of the
    // generating pixel formula at the 6x11 dHash grid.
    def replay(id: Long): Long = {
      val w = (1 + id % 13).toInt
      val h = (1 + id % 7).toInt
      Multimodal.dHash60(
        (x, y) => ((id + 31L * x + 17L * y) % 256).toInt, w, h)
    }
    for (id <- Seq(0L, 1L, 7L, 12L, 13L, 91L, 97L, 23295L)) {
      assert(Multimodal.imageDHash(Multimodal.makePng(id)) == Some(replay(id)),
        s"id $id")
    }
    // non-decodable payloads hash to nothing
    assert(Multimodal.imageDHash("not a png".getBytes("UTF-8")).isEmpty)
  }

  test("image near-dup pairs: identical images at hamming 0, banding exact") {
    // ids congruent mod lcm(13, 7, 256) = 23296 generate IDENTICAL images
    val ids = Seq(3L, 5L, 40L, 3L + 23296L, 5L + 23296L)
    val imgs = Multimodal.imagePayloads(ids.toDF("doc_id"), "doc_id")
    val hashes = Multimodal.imageHashes(imgs, "doc_id")
    assert(hashes.count() == ids.size)
    val pairs = graft.operators.NearDup.simhashPairs(hashes, 4)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((3L, 3L + 23296L, 0L)))
    assert(pairs.contains((5L, 5L + 23296L, 0L)))
    // banding+verify equals the brute-force Hamming join on the hashes
    val hs = hashes.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 4
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(pairs == brute)
  }

  test("JPEG payloads really decode and pair with their PNG siblings") {
    // ids picked at the widest image (id % 13 == 12 -> w = 13) with
    // varied heights — wide rows give the dHash comparisons real
    // gradient margins for JPEG noise to be tolerated by
    val ids = Seq(12L, 90L, 51L, 142L)
    for (id <- ids) {
      val jpg = Multimodal.makeJpeg(id)
      // actual JPEG SOI marker
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
      // REAL decode: the generating formula's dimensions — the stub
      // could never produce them (its width floor is 16)
      val Some((w, h, c, _)) = Multimodal.decodeImage(jpg)
      assert(w == (1 + id % 13).toInt && h == (1 + id % 7).toInt && c == 3,
        s"id $id")
    }
    // cross-codec near-dup end-to-end through the exact q_image_neardup
    // chain: the SAME formula image as PNG (id) and JPEG (id + 1000)
    // must land within the Hamming band — the codec-robustness property
    // dHash exists for (JPEG is lossy, so the closed-form oracle can't
    // cover it; this spec is the JPEG contract instead)
    val rows = ids.map(id => (id, Multimodal.makePng(id))) ++
      ids.map(id => (id + 1000L, Multimodal.makeJpeg(id)))
    val hashes = Multimodal.imageHashes(rows.toDF("doc_id", "payload"), "doc_id")
    assert(hashes.count() == rows.size)   // both codecs hash — none dropped
    val pairs = graft.operators.NearDup.simhashPairs(hashes, 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val caught = ids.count(id => pairs.contains((id, id + 1000L)))
    assert(caught >= 3,
      s"cross-codec pairs caught: $caught of ${ids.size}; pairs=$pairs")
  }

  test("decodeStub is deterministic and byte-driven") {
    val a = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    assert(a == Multimodal.decodeStub("abc".getBytes("UTF-8")))
    assert(a._1 == 16 * (1 + 'a' % 32) && a._2 == 16 * (1 + 3 % 32) && a._3 == 3)
    assert(Multimodal.decodeStub(Array.emptyByteArray) == ((16, 16, 3, 0.0)))
  }

  test("sharedFramePairs: shared sampled chunks pair up; hot frames guarded") {
    import spark.implicits._
    def block(c: Char) = c.toString * Multimodal.ChunkBytes
    // A and B share chunk 0 (sampled at stride 2); C shares nothing.
    val docs = Seq(
      (1L, block('x') + block('y')),
      (2L, block('x') + block('z')),
      (3L, block('w'))
    ).toDF("doc_id", "text")
    val got = Multimodal.sharedFramePairs(
      Multimodal.withPayload(docs, "text"), "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
    // a frame present in every doc is dropped by the frequency guard...
    val hot = (10L to 15L).map(i => (i, block('h'))).toDF("doc_id", "text")
    assert(Multimodal.sharedFramePairs(Multimodal.withPayload(hot, "text"),
      "doc_id", maxDocsPerFrame = 3).count() == 0)
    // ...and pairs all 6C2 = 15 items when the guard clears it
    assert(Multimodal.sharedFramePairs(Multimodal.withPayload(hot, "text"),
      "doc_id", maxDocsPerFrame = 6).count() == 15)
  }
}
