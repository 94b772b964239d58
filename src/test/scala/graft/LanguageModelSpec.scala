package graft

import graft.operators.{LanguageModel, Retrieval}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the bigram-LM scorer and BM25 — the
  * fixed-point freezing means every expected value is an exact integer.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // Corpus: "a b a b" and "a c". Bigrams: (a b) x2, (b a) x1, (a c) x1.
  // Contexts: a x3, b x1. Vocab {a, b, c} -> V = 3.
  private lazy val docs =
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")

  test("likelihood matches the hand-computed smoothed bigram model") {
    // doc 1 bigrams: (a b): (2+1)/(3+3)=0.5 -> 5e11 (x2); (b a):
    // (1+1)/(1+3)=0.5 -> 5e11. sum=1.5e12, n=3, avg=5e11.
    // doc 2: (a c): (1+1)/(3+3)=1/3 -> round(1e12/3)=333333333333.
    val out = LanguageModel.likelihood(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array(
      (1L, 3L, 1500000000000L, 500000000000L),
      (2L, 1L, 333333333333L, 333333333333L)))
  }

  test("unseen bigrams and contexts back off through the smoothing") {
    // Score "x y" under the model above: c_xy=0, c_x=0 -> (0+1)/(0+3).
    val out = LanguageModel.scoreAgainst(docs,
        Seq((9L, "x y")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array((9L, 1L, 333333333333L, 333333333333L)))
  }

  test("empty training corpus voids the model (V > 0 guard)") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LanguageModel.scoreAgainst(noDocs, docs, "doc_id", "text")
      .count() == 0)
    assert(LanguageModel.likelihood(noDocs, "doc_id", "text").count() == 0)
  }

  test("contrast is in-domain minus out-domain and needs both models") {
    val mixed = Seq(
      (1L, "a b a b", true), (2L, "a c", false), (3L, "a b", true))
      .toDF("doc_id", "text", "dom")
    val out = LanguageModel.contrast(mixed, "doc_id", "text", col("dom"))
    val rows = out.orderBy("doc_id")
      .select("doc_id", "delta_e12").as[(Long, Long)].collect()
    assert(rows.length == 3)
    // Doc 3 "a b" is the in-domain majority transition: likelier under
    // the in model than under the out model (which never saw "a b").
    val d3 = rows.find(_._1 == 3L).get._2
    assert(d3 > 0)
    // One empty side voids the whole contrast.
    assert(LanguageModel.contrast(mixed, "doc_id", "text", lit(true))
      .count() == 0)
  }

  test("dsir weights: single-bucket case is exactly neutral") {
    // nBuckets = 1 collapses all features: both distributions are the
    // same point mass, every ratio is exactly 1.0 -> 1e6.
    val raw = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val target = Seq((1L, "a b")).toDF("doc_id", "text")
    val out = LanguageModel.importanceWeights(raw, target, "doc_id", "text", 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(out === Array((1L, 1L, 1000000L, 1000000L),
      (2L, 1L, 1000000L, 1000000L)))
  }

  test("dsir weights separate target-like from non-target docs") {
    val raw = Seq((1L, "x y"), (2L, "z w")).toDF("doc_id", "text")
    val target = Seq((9L, "x y")).toDF("doc_id", "text")
    val out = LanguageModel
      .importanceWeights(raw, target, "doc_id", "text", 1 << 20)
      .orderBy("doc_id").select("doc_id", "avg_r_e6")
      .as[(Long, Long)].collect().toMap
    // the target bigram's bucket is upweighted past neutral; the unseen
    // one downweighted below it
    assert(out(1L) > 1000000L && out(2L) < 1000000L, out)
    // empty target voids the weighting
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LanguageModel.importanceWeights(raw, none, "doc_id", "text", 16)
      .count() == 0)
  }

  test("bm25 ranks the doc dense in a rare term first") {
    // "z" appears only in doc 3 (df=1, rare); "a" is everywhere.
    val corpus = Seq(
      (1L, "a a a a"), (2L, "a b b b"), (3L, "z z a b"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("z", "b"), 3)
      .select("doc_id", "n_terms", "score_e12")
      .as[(Long, Long, Long)].collect()
    // Doc 1 matches no query term -> absent; doc 3 (rare z x2 + b) beats
    // doc 2 (common b x3).
    assert(out.map(_._1).toSeq == Seq(3L, 2L))
    assert(out(0)._2 == 2L && out(1)._2 == 1L)
    assert(out(0)._3 > out(1)._3)
  }

  test("bm25 on an empty corpus is empty") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(noDocs, "doc_id", "text", Seq("a"), 5)
      .count() == 0)
  }

  test("likelihood matches a driver-side replay on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    def tokensOf(t: String): Seq[String] = {
      val s = t.toLowerCase.trim
      if (s.isEmpty) Nil else s.split("\\s+").toSeq
    }
    val bigrams = docs.map { case (id, t) =>
      id -> tokensOf(t).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq
    }.toMap
    val all = bigrams.values.flatten.toSeq
    val cxy = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = docs.flatMap(d => tokensOf(d._2)).distinct.size.toLong
    def pE12(b: (String, String)): Long =
      new java.math.BigDecimal(
        1.0e12 * ((cxy(b) + 1L).toDouble / (cx(b._1) + v).toDouble))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val expected = bigrams.collect { case (id, bs) if bs.nonEmpty =>
      val sums = bs.map(pE12)
      (id, bs.size.toLong, sums.sum, sums.sum / bs.size)
    }.toSet
    val got = LanguageModel.likelihood(
        spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("bm25Batch agrees with per-query bm25TopK and shares one scan") {
    val corpus = Seq(
      (1L, "a a a a"), (2L, "a b b b"), (3L, "z z a b"), (4L, "c c z"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "z b"), (20L, "c")).toDF("query_id", "qtext")
    val got = Retrieval.bm25Batch(corpus, "doc_id", "text",
        qs, "query_id", "qtext", 3)
      .select("query_id", "rank", "doc_id", "score_e12")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
      .toMap
    // per-query replay through the single-set form
    def single(terms: Seq[String]) =
      Retrieval.bm25TopK(corpus, "doc_id", "text", terms, 3)
        .select("doc_id", "score_e12").as[(Long, Long)].collect().toSeq
    assert(got(10L) == single(Seq("z", "b")))
    assert(got(20L) == single(Seq("c")))
    // duplicate query terms collapse (distinct semantics)
    val dup = Retrieval.bm25Batch(corpus, "doc_id", "text",
        Seq((30L, "z z b")).toDF("query_id", "qtext"), "query_id", "qtext", 3)
      .select("doc_id", "score_e12").as[(Long, Long)].collect().toSeq
    assert(dup == single(Seq("z", "b")))
  }
}
