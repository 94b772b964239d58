package graft
// (Retrieval composite tests live here too — it builds on Chunker.)

import graft.operators.Chunker
import org.apache.spark.sql.functions.col

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Long, String)] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Chunker.chunk(df, "doc_id", "text", size, stride)
      .select("chunk_idx", "chunk").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
  }

  test("exact partitioning when size == stride") {
    assert(chunksOf("abcdefghij", 4, 4) ==
      Seq((0L, "abcd"), (1L, "efgh"), (2L, "ij")))
  }

  test("overlapping windows cover every char; last chunk may be short") {
    // size 5, stride 3 over 8 chars: starts 0,3,6
    assert(chunksOf("abcdefgh", 5, 3) ==
      Seq((0L, "abcde"), (1L, "defgh"), (2L, "gh")))
  }

  test("token chunking: overlap, coverage, whitespace normalization, empty doc") {
    def tokChunks(text: String, m: Int, s: Int): Seq[(Long, String, Long)] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      Chunker.chunkTokens(df, "doc_id", "text", m, s)
        .select("chunk_idx", "chunk", "chunk_tokens").as[(Long, String, Long)]
        .collect().sortBy(_._1).toSeq
    }
    // 7 tokens, window 4, stride 3: starts 0,3,6 -> overlap of 1 token
    assert(tokChunks("a b c d e f g", 4, 3) ==
      Seq((0L, "a b c d", 4L), (1L, "d e f g", 4L), (2L, "g", 1L)))
    // runs of whitespace collapse: token multiset is what matters
    assert(tokChunks("  a   b  ", 4, 4) == Seq((0L, "a b", 2L)))
    assert(tokChunks("", 4, 4) == Seq((0L, "", 0L)))
    // every token appears in some chunk (coverage), exact count at size==stride
    assert(tokChunks((1 to 10).map("t" + _).mkString(" "), 5, 5).map(_._3).sum == 10L)
  }

  test("doc shorter than one chunk yields exactly one chunk; empty doc one empty chunk") {
    assert(chunksOf("ab", 400, 300) == Seq((0L, "ab")))
    assert(chunksOf("", 400, 300) == Seq((0L, "")))
  }

  test("boundary: len == stride gives one chunk, len == stride+1 gives two") {
    assert(chunksOf("abc", 3, 3) == Seq((0L, "abc")))
    assert(chunksOf("abcd", 3, 3) == Seq((0L, "abc"), (1L, "d")))
  }

  test("character (not byte) indexing on multi-byte text") {
    assert(chunksOf("äöüßé", 2, 2) == Seq((0L, "äö"), (1L, "üß"), (2L, "é")))
  }

  test("property: chunks reconstruct the original text for random corpora") {
    val rnd = new scala.util.Random(23)
    val alphabet = Seq("a", "b", " ", "X", "é", "😀", "\n")
    val docs = (0 until 300).map { i =>
      val len = rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    for ((size, stride) <- Seq((4, 4), (5, 3), (7, 2), (400, 300))) {
      val byDoc = Chunker.chunk(df, "doc_id", "text", size, stride)
        .select("doc_id", "chunk_idx", "chunk")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, text) =>
        val chunks = byDoc(id)
        // contiguous coverage: the first `stride` chars of every non-last
        // chunk, then the last chunk whole, is exactly the document
        val rebuilt = chunks.init.map(c =>
          c.codePoints().toArray.take(stride)
            .foldLeft(new java.lang.StringBuilder)((sb, cp) => sb.appendCodePoint(cp))
            .toString).mkString + chunks.last
        assert(rebuilt == text, s"doc $id size=$size stride=$stride")
        assert(chunks.forall(c => c.codePointCount(0, c.length) <= size))
      }
    }
  }

  test("no shuffle in the plan — chunking is a narrow transform") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val plan = Chunker.chunk(df, "doc_id", "text", 4, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("retrieval composite: stub embeddings deterministic, self at rank 1, dup text found") {
    import graft.operators.Retrieval
    // doc 97000/1000=97: construct ids so one chunk id hits the % 97 query set
    val docs = Seq(
      (97L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 97
      (7L, "completely different content about spark and parquet files")
    ).toDF("doc_id", "text")
    // determinism + shape of the stub embedder
    val e = docs.select(Retrieval.stubEmbedding(col("text"), 8).as("e"))
      .as[Seq[Double]].collect()
    assert(e.forall(_.length == 8))
    assert(e.forall(_.forall(x => x >= 0.0 && x < 1.0)))
    assert(e(0) == e(1) && e(0) != e(2))   // same text -> same vector
    val got = Retrieval.chunkRetrievalTopK(docs, "doc_id", "text",
        400, 300, 8, 97L, 3)
      .as[(Long, Long, Long, Double)].collect()
    val q = got.filter(_._1 == 97000L)
    assert(q.nonEmpty, s"expected query chunk 97000 in ${got.toSeq}")
    // identical text -> sim exactly 1 for both self and the dup; the
    // deterministic (sim DESC, vec_id ASC) tie-break puts the lower chunk
    // id (5000, the dup) at rank 1 and self at rank 2 — both at sim 1
    val top2 = q.filter(_._2 <= 2L).sortBy(_._2)
    assert(top2.map(_._3).toSeq == Seq(5000L, 97000L), top2.toSeq)
    top2.foreach(r => assert(math.abs(r._4 - 1.0) < 1e-12))
    // the unrelated doc's chunk ranks strictly below
    assert(q.find(_._2 == 3L).get._4 < 1.0 - 1e-9)
  }

  test("CDC chunks cover every token exactly once, in order") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val ch = Chunker.contentDefinedChunks(docs, "doc_id", "text", 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens").as[(Long, Long)].collect()
    assert(ch.map(_._2).sum == 8L)                      // all tokens, once
    assert(ch.map(_._1).toSeq == ch.map(_._1).toSeq.distinct) // one row per chunk
    // chunk ids are the running boundary count: consecutive, step <= 1
    val ids = ch.map(_._1)
    assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 })
  }

  test("CDC is offset-resilient: an inserted token leaves later chunks intact") {
    // Fixed-width chunking would shift everything after the insertion;
    // content-defined boundaries re-synchronize at the next boundary
    // token, so the duplicated tail produces identical chunk hashes.
    val tail = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq((1L, s"prefix $tail"), (2L, s"prefix inserted $tail"))
      .toDF("doc_id", "text")
    val ch = Chunker.contentDefinedChunks(docs, "doc_id", "text", 2)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = h1.intersect(h2)
    // all chunks strictly after the first boundary past the insertion
    // match; only the head chunk(s) differ
    assert(shared.size >= h1.size - 2,
      s"expected near-total overlap, got ${shared.size} of ${h1.size}")
    // and an identical pair of docs chunks identically
    val dup = Seq((1L, tail), (2L, tail)).toDF("doc_id", "text")
    val dh = Chunker.contentDefinedChunks(dup, "doc_id", "text", 2)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    assert(dh.filter(_._1 == 1L).map(_._2).toSet ==
      dh.filter(_._1 == 2L).map(_._2).toSet)
  }

  test("CDC chunking equals a driver-side reference replay on random docs") {
    // reference: boundary when md5-60(token) % m == 0; chunk idx is the
    // inclusive running boundary count; hash = md5 of space-joined chunk
    def h60(s: String): BigInt =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    def reference(text: String, m: Int): Seq[(Long, Long, String)] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) return Nil
      var idx = 0L
      val groups = scala.collection.mutable.LinkedHashMap.empty[Long, Vector[String]]
      toks.foreach { t =>
        if (h60(t) % m == 0) idx += 1
        groups(idx) = groups.getOrElse(idx, Vector.empty) :+ t
      }
      groups.toSeq.map { case (ci, ts) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(ts.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (ci, ts.length.toLong, md)
      }
    }
    val rnd = new scala.util.Random(42)
    val vocabW = Vector("ga", "bo", "tu", "mi", "ra", "ke", "zu", "lo")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(30))(vocabW(rnd.nextInt(vocabW.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Chunker.contentDefinedChunks(df, "doc_id", "text", 3)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(r => (r._2, r._3, r._4)).toSeq).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == reference(text, 3), s"doc $id diverged")
    }
  }

  test("CDC dedup report counts copies and reclaimable mass") {
    val docs = Seq((1L, "x x x"), (2L, "x x x"), (3L, "y y")).toDF("doc_id", "text")
    // "x x x" chunks identically in docs 1 and 2 (cross-doc dup); "y y"
    // may also self-dup WITHIN doc 3 if "y" is a boundary token — both
    // are legitimate CDC duplicates, so assert the invariants, not a
    // hand-picked layout.
    val rep = Chunker.cdcDedupReport(docs, "doc_id", "text", 4)
      .select("n_tokens", "n_copies", "n_docs", "dup_tokens", "is_dup")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val dups = rep.filter(_._5)
    assert(dups.forall(r => r._4 == (r._2 - 1) * r._1 && r._2 > 1))
    // the identical docs 1 and 2 must share every chunk: some row spans 2 docs
    assert(dups.exists(r => r._3 == 2L && r._2 == 2L))
    assert(rep.filter(!_._5).forall(r => r._2 == 1L && r._4 == 0L))
    // empty corpus -> empty report
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Chunker.contentDefinedChunks(empty, "doc_id", "text", 4).count() == 0)
    assert(Chunker.cdcDedupReport(empty, "doc_id", "text", 4).count() == 0)
  }
}
