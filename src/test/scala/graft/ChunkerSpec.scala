package graft

import graft.operators.Chunker

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
}
