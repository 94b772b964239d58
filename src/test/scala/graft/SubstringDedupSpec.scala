package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // 10-token paragraph duplicated across documents; fillers share no 3-gram
  // with it or each other.
  private val para =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private def corpus = Seq(
    (1L, s"intro one two $para"),                    // para at tokens 4..13
    (2L, s"$para outro three"),                      // para at tokens 1..10
    (3L, "totally unrelated filler content here"),   // no overlap
    (4L, s"x y z $para q r s $para")                 // para twice: 4..13, 17..26
  ).toDF("doc_id", "text")

  test("finds the maximal shared span with exact positions and length") {
    val spans = SubstringDedup.sharedSpans(corpus.filter(col("doc_id") <= 3),
        "doc_id", "text", 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 2L, 4L, 1L, 10L)))
  }

  test("a passage repeated in one document reports one span per copy") {
    val spans = SubstringDedup.sharedSpans(
        corpus.filter(col("doc_id") === 1 || col("doc_id") === 4),
        "doc_id", "text", 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 4L, 4L, 4L, 10L), (1L, 4L, 4L, 17L, 10L)))
  }

  test("runs below minTokens are filtered; below k are invisible") {
    val df = Seq(
      (1L, "one two three four five unique1 unique2"),
      (2L, "one two three four five other1 other2"),   // 5-token run < 8
      (3L, "pp qq unrelated indeed")
    ).toDF("doc_id", "text")
    assert(SubstringDedup.sharedSpans(df, "doc_id", "text", 8).count() == 0)
    // the same run clears a minTokens at its size
    val spans = SubstringDedup.sharedSpans(df, "doc_id", "text", 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 2L, 1L, 1L, 5L)))
  }

  test("matching is case-insensitive but positions index original tokens") {
    val df = Seq(
      (1L, s"pre ${para.toUpperCase}"),
      (2L, para)
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.sharedSpans(df, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 2L, 2L, 1L, 10L)))
  }

  test("removeSharedSpans strips the higher-id copy and keeps the canonical one") {
    val out = SubstringDedup.removeSharedSpans(
        corpus.filter(col("doc_id") <= 3), "doc_id", "text", 8)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (s"intro one two $para", 0L))     // canonical keeps all
    assert(out(2L) == ("outro three", 10L))             // span removed
    assert(out(3L) == ("totally unrelated filler content here", 0L))
  }

  test("overlapping spans from different pairs remove each token once") {
    // doc 3 duplicates doc 1's paragraph AND doc 2's distinct paragraph,
    // adjacent to each other — removal sets overlap-free union
    val paraB = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val df = Seq(
      (1L, para),
      (2L, paraB),
      (3L, s"$para $paraB tail1 tail2")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.removeSharedSpans(df, "doc_id", "text", 8)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(3L) == ("tail1 tail2", 20L))
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
  }

  test("redactEvalSpans cuts leaked eval runs from train docs, keeps everything else") {
    val train = Seq(
      (10L, s"intro one two $para"),                  // leaks para (tokens 4..13)
      (12L, "totally unrelated training content right here"),
      (14L, s"$para $para")                           // leaks para TWICE
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (21L, s"eval question setup $para answer below"),
      (23L, "pristine eval material no overlap")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.redactEvalSpans(train, eval_, "doc_id", "text", 8)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == (("intro one two", 10L)))       // leak cut, context kept
    assert(out(12L) ==
      (("totally unrelated training content right here", 0L)))   // clean doc whole
    assert(out(14L) == (("", 20L)))                    // both copies cut
    assert(out.size == 3)                              // every train doc returns
    // eval docs are never rewritten — the output is train-side only
    assert(!out.contains(21L) && !out.contains(23L))
  }

  test("spans report plans the posting join as shuffle-hash, never a cartesian") {
    val p = SubstringDedup.sharedSpans(Tables.documents(spark, sf0001),
      "doc_id", "text", 8).queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
