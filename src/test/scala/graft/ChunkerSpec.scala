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

  test("no shuffle in the plan — chunking is a narrow transform") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val plan = Chunker.chunk(df, "doc_id", "text", 4, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
