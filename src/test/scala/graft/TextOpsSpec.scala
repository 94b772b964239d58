package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox, jumps!"),
    (2L, "  la   de   que  "),
    (3L, ""),
    (4L, "der und von zu"),
    (5L, "THE  Quick   brown fox, jumps!")  // normalizes like doc 1? (case+ws)
  ).toDF("doc_id", "text")

  test("token/punct/stopword counts") {
    val r = TextOps.stats(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_tokens") == 5L)
    assert(r(0).getAs[Long]("n_punct") == 2L)   // ',' and '!'
    assert(r(0).getAs[Long]("n_stop_en") == 1L) // 'the'
    assert(r(1).getAs[Long]("n_tokens") == 3L)  // trimmed + collapsed
    assert(r(2).getAs[Long]("n_tokens") == 0L)
    assert(r(2).getAs[Double]("quality") >= 0.0 && r(2).getAs[Double]("quality") <= 1.0)
  }

  test("language prediction with alphabetical tie-break") {
    val out = TextOps.languageScores(docs, "text").select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(4L) == "de")
    assert(out(2L) == "es")   // 'la','de','que' hit es (and 'de' hits de/fr 1x) -> es wins on count
    assert(out(3L) == "xx")   // empty text: no hits
  }

  test("bpe-ish token count splits contractions, numbers, and punct runs") {
    val rows = Seq(
      (1L, "don't stop"),        // don | 't | _stop
      (2L, "I'll pay $42.50!"),  // I | 'll | _pay | _$ | 42 | . | 50 | !
      (3L, ""),                  // no matches
      (4L, "  hi  ")             // "  " would glue to nothing: _hi then trailing "  "
    ).toDF("doc_id", "text")
    val got = rows.select($"doc_id", TextOps.bpeTokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 8L, 3L -> 0L, 4L -> 3L))
  }

  test("top-quality query plans as TakeOrderedAndProject, not a global sort") {
    val q = SparkEntry.queries("q_top_quality")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    val rows = q.collect()
    assert(rows.length == 20)
    // deterministically ordered: quality desc, doc_id asc on ties
    val pairs = rows.map(r => (r.getDouble(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (q1, id) => (-q1, id) }))
  }

  test("repetition stats: distinct counts and top token/bigram dominance") {
    val rows = Seq(
      (1L, "a a a b"),          // top token a=3; bigrams: "a a","a a","a b" -> top 2
      (2L, "x"),                // single token: no bigrams
      (3L, ""),                 // empty: all zeros
      (4L, "p q p q p q")       // top token 3; bigram "p q"=3 > "q p"=2
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((4L, 2L, 3L, 2L)))
    assert(got(2L) == ((1L, 1L, 1L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((6L, 2L, 3L, 3L)))
  }

  test("fingerprint is case/whitespace-insensitive") {
    val fps = docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(5L))
    assert(fps(1L) != fps(2L))
  }

  test("fingerprint groups collapse exact dups") {
    val g = TextOps.fingerprintGroups(docs, "doc_id", "text")
    assert(g.count() == 4)
    assert(g.filter($"n_docs" === 2).select("canonical_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("data card: per-stratum counts, distinct fps, fixed-point quality sum") {
    val rows = Seq(
      ("en", "s0", "the quick fox"),
      ("en", "s0", "THE  Quick   fox"), // same fingerprint as above
      ("en", "s1", "other text"),
      ("de", "s0", "")
    ).toDF("lang", "source", "text")
    val got = TextOps.dataCard(rows, "text", Seq("lang", "source"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    assert(got.keySet == Set(("en", "s0"), ("en", "s1"), ("de", "s0")))
    val (nDocs, nFp, nTok, qSum) = got(("en", "s0"))
    assert(nDocs == 2L && nFp == 1L && nTok == 6L)
    // both docs score identically (same normalized stats) -> sum = 2x one
    val oneQ = TextOps.dataCard(rows.limit(1), "text", Seq("lang"))
      .select("quality_micro_sum").as[Long].head()
    assert(qSum == 2 * oneQ)
    assert(got(("de", "s0")) == ((1L, 1L, 0L,
      TextOps.dataCard(rows.filter($"lang" === "de"), "text", Seq("lang"))
        .select("quality_micro_sum").as[Long].head())))
  }

  test("gopher rules: per-rule booleans, zero-token docs fail ratio rules") {
    val longDoc = (("the and of to in is you that it for " * 5).trim + " " +
      Seq.tabulate(10)(i => s"word$i").mkString(" "))  // 60 words, all alpha
    val rows = Seq(
      (1L, longDoc),            // passes all four rules
      (2L, "the and short"),    // fails word count, passes stopwords
      (3L, ""),                 // zero tokens: every ratio rule false
      (4L, ("42 " * 60).trim)   // 60 words, no letters -> alpha rule false
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRules(rows, "doc_id", "text")
      .select("doc_id", "r_word_count", "r_mean_len", "r_alpha_ratio",
        "r_stopwords", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(got(1L) == ((true, true, true, true, true)))
    assert(got(2L) == ((false, true, true, true, false)))
    assert(got(3L) == ((false, false, false, false, false)))
    assert(got(4L) == ((true, false, false, false, false))) // mean len 2 < 3
  }

  test("blocklist flags: occurrence counts, case-insensitive, empty text kept") {
    val rows = Seq(
      (1L, "clean text here"),
      (2L, "some SPAM and more spam"),
      (3L, ""),
      (4L, "dup dup dup")
    ).toDF("doc_id", "text")
    val got = TextOps.blocklistFlags(rows, "doc_id", "text", Seq("Spam", "dup"))
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(
      1L -> ((0L, true)), 2L -> ((2L, false)),
      3L -> ((0L, true)), 4L -> ((3L, false))))
  }

  test("rarity score: exact unigram sufficient statistics") {
    // corpus counts: the=2 (docs 1,2), cat=2 (1,2), rare=1 (doc 2)
    val rows = Seq(
      (1L, "the cat"),
      (2L, "the cat rare THE"), // lowercased: the x2
      (3L, "")                  // no tokens -> dropped
    ).toDF("doc_id", "text")
    // counts: the=3, cat=2, rare=1
    val got = TextOps.rarityScore(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((2L, 3L + 2L, 2L)))           // the(3) + cat(2); rarest = cat(2)
    assert(got(2L) == ((4L, 2L * 3L + 2L + 1L, 1L))) // 2*the(3) + cat(2) + rare(1)
  }

  test("oov stats: top-N vocab membership, integer permille, empty docs") {
    // counts: a=4, b=3, c=2, d=1 -> vocab(2) = {a, b}; c and d are OOV
    val rows = Seq(
      (1L, "a b a"),       // 3 tokens, 0 oov
      (2L, "a B c d"),     // lowercased; 4 tokens, 2 oov -> 500 permille
      (3L, "c a"),         // 2 tokens, 1 oov -> 500
      (4L, "")             // empty -> (0, 0, 0)
    ).toDF("doc_id", "text")
    val got = TextOps.oovStats(rows, "doc_id", "text", 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((3L, 0L, 0L)),
      2L -> ((4L, 2L, 500L)),
      3L -> ((2L, 1L, 500L)),
      4L -> ((0L, 0L, 0L))))
  }

  test("dup n-gram stats: Gopher all-occurrences convention, short docs") {
    val rows = Seq(
      // 3-grams: "a b a","b a b","a b a","b a b","a b c" -> 5 grams,
      // 3 distinct, dup grams {aba:2, bab:2} -> n_dup = 4 -> 800 permille
      (1L, "a b a b a b c"),
      (2L, "x y z w"),   // 2 grams, no dups
      (3L, "p q"),       // shorter than n -> (0,0,0,0)
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.dupNgramStats(rows, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((5L, 3L, 4L, 800L)),
      2L -> ((2L, 2L, 0L, 0L)),
      3L -> ((0L, 0L, 0L, 0L)),
      4L -> ((0L, 0L, 0L, 0L))))
  }

  test("oov vocab tie-break is deterministic (count desc, token asc)") {
    // b and c tie at 2; vocab(2) takes a(3) then b (alphabetical)
    val rows = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val got = TextOps.oovStats(rows, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == ((7L, 2L))) // the two c's are OOV
  }

  test("domainShiftTokens: exclusive tokens rank first; swap flips directions") {
    val a = Seq((1L, "alpha alpha shared common"), (2L, "alpha shared")).toDF("doc_id", "text")
    val b = Seq((3L, "beta beta shared common"), (4L, "beta shared common")).toDF("doc_id", "text")
    val out = TextOps.domainShiftTokens(a, b, "text", 2)
      .as[(String, String, Long, Long, Double)].collect()
    val dirA = out.filter(_._1 == "a").map(_._2).toSeq
    val dirB = out.filter(_._1 == "b").map(_._2).toSeq
    assert(dirA.head == "alpha" && dirB.head == "beta", out.mkString(","))
    // swapping corpora flips the directions but keeps the token sets
    val swapped = TextOps.domainShiftTokens(b, a, "text", 2)
      .as[(String, String, Long, Long, Double)].collect()
    assert(swapped.filter(_._1 == "a").map(_._2).toSet == dirB.toSet)
    assert(swapped.filter(_._1 == "b").map(_._2).toSet == dirA.toSet)
    // counts carried: alpha appears 3x in A, 0x in B
    val alpha = out.find(_._2 == "alpha").get
    assert(alpha._3 == 3L && alpha._4 == 0L)
    // both-empty input: empty result, no error
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.domainShiftTokens(none, none, "text", 5).count() == 0)
  }

  test("sketchDistinctAudit: merged-sketch estimate equals the single-pass estimate") {
    val d = Tables.documents(spark, sf0001)
    val base = d.select(col("lang"),
      TextOps.fingerprint(col("text")).as("fp"))
    // HLL's defining property: union of per-stratum sketches estimates
    // the SAME value as one sketch over everything (deterministic, not
    // just approximately equal)
    val direct = base.agg(hll_sketch_estimate(hll_sketch_agg(col("fp"))))
      .head().getLong(0)
    val merged = base.groupBy("lang").agg(hll_sketch_agg(col("fp")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    assert(direct == merged)
    // and the audit's flags hold on the fixture, __all__ row present
    val out = TextOps.sketchDistinctAudit(d, "text", "lang")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.exists(_._1 == "__all__"))
    assert(out.forall(_._4), s"sketch out of bound: ${out.mkString(",")}")
    val all = out.find(_._1 == "__all__").get
    assert(all._2 == out.filter(_._1 != "__all__").map(_._2).sum)
  }

  test("codeSwitchStats counts window-level language switches") {
    // 20-token windows: doc 1 = EN window then DE window then EN window
    // (2 switches, 2 langs, dominant en by count); doc 2 = one EN window.
    val en = Seq.fill(20)("the").mkString(" ")
    val de = Seq.fill(20)("der").mkString(" ")
    val docs = Seq(
      (1L, s"$en $de $en"),
      (2L, "the and of")).toDF("doc_id", "text")
    val got = TextOps.codeSwitchStats(docs, "doc_id", "text", 20)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got === Array(
      (1L, 3L, 2L, 2L, "en"),
      (2L, 1L, 1L, 0L, "en")))
    // modal tie (one window each) breaks to the alphabetical minimum
    val tie = Seq((3L, s"$en $de")).toDF("doc_id", "text")
    val t3 = TextOps.codeSwitchStats(tie, "doc_id", "text", 20)
      .as[(Long, Long, Long, Long, String)].head()
    assert(t3 == ((3L, 2L, 2L, 1L, "de")))
  }

  test("q_quality_retention curve: 11 rows, t=0 keeps everything, monotone non-increasing") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = SparkEntry.queries("q_quality_retention")(spark, sf0001)
      .orderBy("threshold_e1")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == (0L to 10L))
    val (nDocs, nToks) = (docs.count(),
      docs.select(sum(TextOps.tokenCount(col("text")))).head.getLong(0))
    assert(rows.head._2 == nDocs && rows.head._3 == nToks)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"not monotone at ${b._1}")
    }
  }
}
