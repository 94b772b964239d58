package graft

import graft.operators.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // Four docs; "cookie banner text" is a 3-token boilerplate segment
  // ALIGNED at a segment boundary in three of them (k = 3).
  private val corpus = Seq(
    (1L, "cookie banner text alpha beta gamma"),
    (2L, "cookie banner text delta eps zeta"),
    (3L, "cookie banner text eta theta iota"),
    (4L, "kappa lambda mu nu xi omicron")
  ).toDF("doc_id", "text")

  test("segmentPrevalence flags only segments above the doc threshold") {
    val flagged = Boilerplate.segmentPrevalence(corpus, "doc_id", "text", 3, 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(flagged == Seq(("cookie banner text", 3L, 3L)))
    // Threshold above prevalence -> nothing flagged.
    assert(Boilerplate.segmentPrevalence(corpus, "doc_id", "text", 3, 4)
      .count() == 0L)
  }

  test("removeBoilerplate drops every occurrence, keeps clean docs intact") {
    val out = Boilerplate.removeBoilerplate(corpus, "doc_id", "text", 3, 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma", 2L, 1L),
      (2L, "delta eps zeta", 2L, 1L),
      (3L, "eta theta iota", 2L, 1L),
      (4L, "kappa lambda mu nu xi omicron", 2L, 0L)))
  }

  test("a document that is ALL boilerplate survives as an empty row") {
    val df = Seq(
      (1L, "nav bar here"), (2L, "nav bar here"), (3L, "nav bar here tail x y")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(df, "doc_id", "text", 3, 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "", 1L, 1L), (2L, "", 1L, 1L), (3L, "tail x y", 2L, 1L)))
  }

  test("empty docs pass through untouched (absence is not boilerplate)") {
    val df = Seq((1L, ""), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(df, "doc_id", "text", 3, 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "", 1L, 0L), (2L, "", 1L, 0L), (3L, "a b c", 1L, 0L)))
  }

  test("dedupSegmentsWithinDoc keeps the first occurrence only") {
    val df = Seq(
      (1L, "a b a b a b c d"),   // k=2 segments: "a b","a b","a b","c d"
      (2L, "x y z w")            // no repeats
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupSegmentsWithinDoc(df, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "a b c d", 4L, 2L),
      (2L, "x y z w", 2L, 0L)))
  }

  test("a standing flagged set applies to a batch that never saw the audit") {
    val flagged = Boilerplate.segmentPrevalence(corpus, "doc_id", "text", 3, 3)
    val newBatch = Seq(
      (10L, "cookie banner text fresh content here"),
      (11L, "totally novel words only")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplateWith(newBatch, "doc_id", "text", 3, flagged)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, "fresh content here", 2L, 1L),
      (11L, "totally novel words only", 2L, 0L)))
  }

  test("intra-doc dedup is idempotent and composes with removeBoilerplate") {
    val once = Boilerplate.dedupSegmentsWithinDoc(corpus, "doc_id", "text", 3)
    val twice = Boilerplate.dedupSegmentsWithinDoc(
      once.withColumnRenamed("clean_text", "text").select("doc_id", "text"),
      "doc_id", "text", 3)
    val a = once.select("doc_id", "clean_text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val b = twice.select("doc_id", "clean_text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
