package graft

import graft.operators.{Packing, Sampling, TextOps, TfIdf}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a c", "s1"),
    (2L, "b b d", "s1"),
    (3L, "a d d d", "s1"),
    (4L, "", "s2"),
    (5L, "e e e e e", "s2")
  ).toDF("doc_id", "text", "source")

  test("tf-idf: scores and deterministic ranks on a hand corpus") {
    // 4 docs with tokens; df: a=2, b=2, c=1, d=2, e=1; idf = (4+1)/(df+1)
    val out = TfIdf.topTerms(docs, "doc_id", "text", 2)
      .orderBy("id", "rank").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // doc 1: a tf=2 idf=5/3 -> 10/3; b tf=1 idf=5/3; c tf=1 idf=5/2
    val d1 = byDoc(1L).map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(d1.head == ("a", 2L, 2 * (5.0 / 3.0)))
    assert(d1(1) == ("c", 1L, 5.0 / 2.0)) // 2.5 > 5/3: c outranks b
    // doc 5: only term e, tf=5, idf=5/2 -> one row despite k=2
    assert(byDoc(5L).map(_.getString(1)).toSeq == Seq("e"))
    // doc 4 has no tokens -> no rows
    assert(!byDoc.contains(4L))
    // every rank sequence starts at 1 and is dense
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("hash sample: deterministic, nested across rates, roughly proportional") {
    val d = Tables.documents(spark, sf0001).select("doc_id")
    val n = d.count()
    val s20 = Sampling.hashSample(d, "doc_id", 200).as[Long].collect().toSet
    val s50 = Sampling.hashSample(d, "doc_id", 500).as[Long].collect().toSet
    // same seed => thresholds nest; rerun => identical
    assert(s20.subsetOf(s50))
    assert(Sampling.hashSample(d, "doc_id", 200).as[Long].collect().toSet == s20)
    // binomial(n, 0.2): allow a wide band
    assert(s20.size > n * 0.1 && s20.size < n * 0.3, s"got ${s20.size} of $n")
    // a different seed decorrelates the selection
    val s20b = Sampling.hashSample(d, "doc_id", 200, seed = 7).as[Long].collect().toSet
    assert(s20b != s20)
  }

  test("jump_hash matches an unsigned-BigInt reference; growth moves only to the new shard") {
    // independent reference: the paper's uint64 loop in BigInt arithmetic
    def ref(key0: Long, n: Long): Long = {
      val mask = (BigInt(1) << 64) - 1
      var key = BigInt(key0) & mask
      var b = -1L; var j = 0L
      while (j < n) {
        b = j
        key = (key * BigInt("2862933555777941757") + 1) & mask
        j = ((b + 1) * (2147483648.0 / ((key >> 33).toLong + 1L).toDouble)).toLong
      }
      b
    }
    val rnd = new scala.util.Random(3)
    val keys = Seq.fill(300)(rnd.nextLong())    // full signed range: the
    val df = keys.toDF("k")                     // unsigned reinterpret path
    for (n <- Seq(1L, 2L, 8L, 1000L)) {
      val got = df.select(col("k"),
        graft.functions.jump_hash(col("k"), lit(n)).as("s"))
        .as[(Long, Long)].collect().toMap
      keys.foreach { k =>
        assert(got(k) == ref(k, n), s"key=$k n=$n got=${got(k)} want=${ref(k, n)}")
        assert(got(k) >= 0 && got(k) < n)
      }
    }
    // the consistent-hash contract: growing n -> n+1 moves ONLY keys that
    // land in the new bucket, and roughly 1/(n+1) of them
    val moved = keys.filter(k => ref(k, 8) != ref(k, 9))
    assert(moved.nonEmpty && moved.forall(k => ref(k, 9) == 8L))
    assert(moved.length < keys.length / 4)
    // invalid bucket count -> null, not a crash
    assert(df.select(graft.functions.jump_hash(col("k"), lit(0L)).as("s"))
      .filter(col("s").isNotNull).count() == 0)
    // SQL surface
    Graft.registerFunctions(spark)
    assert(spark.sql("SELECT jump_hash(42L, 8L)").first().getLong(0) == ref(42L, 8L))
  }

  test("softDedupWeights: inverse-size weights, singletons always survive") {
    // components: {1,2,3,4} (size 4), {10,11} (size 2), {20} (singleton)
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L)).toDF("doc_id", "component")
    val w = Sampling.softDedupWeights(comp, "doc_id")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(w(1L) == ((4L, 250000L)) && w(10L) == ((2L, 500000L)) &&
      w(20L) == ((1L, 1000000L)))
    // singleton weight 1e6 passes the md5 % 1e6 < w filter for ANY hash
    val kept = Sampling.weightedSample(
      Sampling.softDedupWeights(comp, "doc_id"), "doc_id", "w_micro")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(20L))
    // a 1000-member family keeps ~1 expected doc (w = 1000 micro): bound
    // the realized count loosely — determinism makes this a fixed number
    val big = (1L to 1000L).map(i => (i, 0L)).toDF("doc_id", "component")
    val nBig = Sampling.weightedSample(
      Sampling.softDedupWeights(big, "doc_id"), "doc_id", "w_micro").count()
    assert(nBig <= 6, s"expected ~1 survivor from a 1000-family, got $nBig")
  }

  test("leakFreeSplit: whole near-dup families share a split; non-vacuous") {
    val comp = graft.operators.NearDup.dedupByNearDup(
      Tables.documents(spark, sf0001), "doc_id", "text", 3, 0.5)
      .select(col("doc_id"), col("component"))
    val out = Sampling.leakFreeSplit(comp, "doc_id")
      .as[(Long, Long, String)].collect()
    // every doc assigned, all three splits present
    assert(out.length == comp.count())
    assert(out.map(_._3).toSet == Set("train", "val", "test"))
    // the property the operator exists for: one split per component...
    val byComp = out.groupBy(_._2)
    assert(byComp.values.forall(_.map(_._3).distinct.length == 1))
    // ...and the fixture makes it non-vacuous (multi-doc families exist
    // whose members would straddle splits under per-doc hashing)
    val multi = byComp.values.filter(_.length > 1)
    assert(multi.nonEmpty)
    val perDoc = Sampling.splitAssign(comp, "doc_id")
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(multi.exists(_.map(m => perDoc(m._1)).distinct.length > 1),
      "per-doc hashing never split a family: the fixture can't distinguish the two operators")
  }

  test("lengthQuantiles matches sort-based percentile_disc on random groups") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (s"g${i % 4}", rnd.nextInt(40).toLong + (if (i % 4 == 0) 100 else 0))
    }
    val df = rows.toDF("g", "len")
    val pcts = Seq(25, 50, 90, 99, 100)
    val got = TextOps.lengthQuantiles(df, "g", "len", pcts)
      .as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val expected = rows.groupBy(_._1).flatMap { case (g, gs) =>
      val sorted = gs.map(_._2).sorted
      pcts.map { p =>
        val rank = math.ceil(p * sorted.length / 100.0).toInt
        (g, p.toLong) -> sorted(rank - 1)
      }
    }
    assert(got == expected)

    // nulls are OUTSIDE percentile_disc's domain: a null flood must not
    // drag quantiles low (round-8 review: unfiltered nulls inflated both
    // the group total and, nulls-first, every cumulative count)
    val withNulls = (Seq.fill(97)(("g", None: Option[Long])) ++
      Seq(("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L))))
      .toDF("g", "len")
    val nq = TextOps.lengthQuantiles(withNulls, "g", "len", Seq(50, 99))
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(nq == Map(50L -> 2L, 99L -> 3L), nq)
  }

  test("temperature rebalance: sqrt rates, smallest stratum whole, nests equalize") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf0001).select("doc_id", "lang")
    val langN = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minN = langN.values.min
    val out = Sampling.temperatureRebalance(d, "lang", "doc_id")
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // the smallest stratum's rate is exactly 1000 per mille: all rows kept
    val smallest = langN.minBy(_._2)._1
    assert(kept(smallest) == minN)
    // every kept count is reproducible from the declared rate formula
    langN.foreach { case (lang, n) =>
      val rate = math.floor(1000.0 * math.sqrt(minN.toDouble / n.toDouble)).toLong
      val expect = Sampling.hashSample(
        d.filter(col("lang") === lang), "doc_id", rate.toInt).count()
      assert(kept.getOrElse(lang, 0L) == expect, s"stratum $lang")
    }
    // same seed, lower threshold: the full-equalize selection is a strict
    // subset of the temperature selection (floor(1000x) <= floor(1000*sqrt(x)))
    val eq = Sampling.rebalanceMix(d, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val temp = out.select("doc_id").as[Long].collect().toSet
    assert(eq.subsetOf(temp))
  }

  test("weighted sample: weight 0 drops, 1e6 keeps, mid-weights are the hash band") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf0001).select("doc_id")
    assert(Sampling.weightedSample(
      d.withColumn("w", lit(0L)), "doc_id", "w").count() == 0)
    assert(Sampling.weightedSample(
      d.withColumn("w", lit(1000000L)), "doc_id", "w").count() == d.count())
    // same seed => thresholds nest (a row kept at weight w survives any
    // w' > w); rerun => identical
    val w200 = Sampling.weightedSample(
      d.withColumn("w", lit(200000L)), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    val w500 = Sampling.weightedSample(
      d.withColumn("w", lit(500000L)), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(w200.subsetOf(w500))
    assert(w200.size > d.count() * 0.1 && w200.size < d.count() * 0.3)
    assert(Sampling.weightedSample(
      d.withColumn("w", lit(200000L)), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet == w200)
  }

  test("stratified quota: exact per-stratum sizes, deterministic membership") {
    val d = Tables.documents(spark, sf0001)
    val out = Sampling.stratifiedQuota(d, "lang", "doc_id", 5)
    val sizes = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langSizes = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    langSizes.foreach { case (l, total) =>
      assert(sizes(l) == math.min(5L, total), s"stratum $l")
    }
    // deterministic across runs
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.stratifiedQuota(d, "lang", "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("packing: per-shard prefix offsets and capacity-4 sequence indexes") {
    val out = Packing.pack(docs, "doc_id", "text", "source", 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "seq_index")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0L, 0L),   // s1 stream: [0,4) -> seq 0
      (2L, 3L, 4L, 1L),   //            [4,7) -> starts in seq 1
      (3L, 4L, 7L, 1L),   //            [7,11) -> starts in seq 1
      (4L, 0L, 0L, 0L),   // s2 stream: empty doc occupies nothing
      (5L, 5L, 0L, 0L)))
  }

  test("boundary-respecting packing: greedy first-fit fold, oversized doc spans alone") {
    val out = Packing.packBoundaried(docs, "doc_id", "text", "source", 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_index", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0L, 0L),   // s1: fills seq 0 exactly
      (2L, 3L, 1L, 0L),   //     3 would cross -> opens seq 1
      (3L, 4L, 2L, 0L),   //     4 after fill 3 -> opens seq 2
      (4L, 0L, 0L, 0L),   // s2: empty doc occupies nothing
      (5L, 5L, 0L, 0L)))  //     oversized: spans seqs 0-1 alone
    // no doc with n <= capacity crosses a boundary: offset + n <= capacity
    out.filter(r => r._2 > 0 && r._2 <= 4).foreach { r =>
      assert(r._4 + r._2 <= 4, s"doc ${r._1} crosses a boundary")
    }
    val eff = Packing.packingEfficiency(
      Packing.packBoundaried(docs, "doc_id", "text", "source", 4), "source", 4)
      .orderBy("source")
      .select("source", "n_docs", "used_tokens", "n_seqs", "padding_tokens",
        "utilization")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(eff == Seq(
      ("s1", 3L, 11L, 3L, 1L, 11.0 / 12.0),
      ("s2", 2L, 5L, 2L, 3L, 5.0 / 8.0)))
  }

  test("pii scrub: urls, emails, digit runs replaced; counts pre-scrub") {
    val rows = Seq(
      (1L, "mail me@example.com or visit https://x.io/a?b=1 now"),
      (2L, "call 25-989-741-2988 or 555 123 4567 today"),
      (3L, "clean text, nothing to scrub")
    ).toDF("id", "t")
    val out = TextOps.piiCounts(rows, "id", "t")
      .orderBy("id")
      .select("scrubbed", "n_urls", "n_emails", "n_num_runs")
      .as[(String, Long, Long, Long)].collect()
    assert(out(0) == (("mail <EMAIL> or visit <URL> now", 1L, 1L, 0L)))
    assert(out(1) == (("call <NUM> or <NUM> today", 0L, 0L, 2L)))
    assert(out(2) == (("clean text, nothing to scrub", 0L, 0L, 0L)))
  }

  test("corpus stats: sketch estimates track the exact answers") {
    val d = Tables.documents(spark, sf0001)
    val approx = TextOps.corpusStats(d, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exact = d.select(col("lang"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.tokenCount(col("text")).as("n"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("fp")).as("nd"),
        expr("percentile(n, 0.5)").as("p50"), expr("percentile(n, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, (nDocs, nd, p50, p95)) =>
      val (aDocs, aNd, aP50, aP95) = approx(lang)
      assert(aDocs == nDocs, s"$lang doc count")
      // HLL at rsd=0.02: allow 5%
      assert(math.abs(aNd - nd) <= math.max(1L, (nd * 0.05).toLong), s"$lang hll")
      // percentile_approx with accuracy 10000 on small strata is near-exact;
      // exact percentile interpolates, so allow off-by-one-value
      assert(math.abs(aP50 - p50) <= 1.0, s"$lang p50: $aP50 vs $p50")
      assert(math.abs(aP95 - p95) <= 1.0, s"$lang p95: $aP95 vs $p95")
    }
  }

  test("dot_product: parity with the HOF fold, null and length semantics") {
    val rows = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),      // 32.0
      (2L, Seq(0.1, 0.2), Seq(0.3, 0.7)),                 // fold order matters
      (3L, Seq(1.0), Seq(1.0, 2.0)),                      // length mismatch -> null
      (4L, null, Seq(1.0)),                               // null array -> null
      (5L, Seq(1e300, -1e300, 1.0), Seq(1e10, 1e10, 1.0)) // non-assoc fold check
    ).toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val out = rows.select(col("id"),
        graft.functions.dot_product(col("a"), col("b")).as("native"), hof.as("ref"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    out.foreach { case (id, (native, ref)) =>
      // bit-pattern equality so NaN == NaN (row 5 overflows to inf + -inf)
      assert(native.map(java.lang.Double.doubleToLongBits) ==
        ref.map(java.lang.Double.doubleToLongBits),
        s"row $id: native=$native hof=$ref")
    }
    assert(out(1L)._1.contains(32.0))
    assert(out(3L)._1.isEmpty && out(4L)._1.isEmpty)
  }

  test("dot_product fuses into whole-stage codegen over a parquet scan") {
    val e = Tables.embeddings(spark, sf0001)
    val emb = col("embedding").cast("array<double>")
    val plan = e.select(graft.functions.dot_product(emb, emb).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
  }

  test("z_order: known interleaves, reference bit-loop parity, codegen, SQL") {
    // hand-checked Morton values
    val known = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),                       // x takes even bits
      (0L, 1L, 2L),                       // y takes odd bits
      (3L, 3L, 15L),                      // 0b11 ⊗ 0b11 = 0b1111
      (5L, 3L, 27L),                      // 0b101,0b011 -> 0b11011
      (0xFFFFFFFFL, 0xFFFFFFFFL, -1L)     // full 32+32 bits -> all 64 set
    )
    val got = known.toDF("x", "y", "want")
      .select(graft.functions.z_order(col("x"), col("y")).as("z"), col("want"))
      .as[(Long, Long)].collect()
    got.foreach { case (z, want) => assert(z == want) }
    // property vs a reference bit loop on arbitrary values
    def ref(x: Long, y: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    val zs = samples.toDF("x", "y")
      .select(graft.functions.z_order(col("x"), col("y"))).as[Long].collect()
    samples.zip(zs).foreach { case ((x, y), z) => assert(z == ref(x, y)) }
    // null-intolerant; codegen-friendly; registered on the SQL surface
    val nz = Seq((Option.empty[Long], Option(1L))).toDF("x", "y")
      .select(graft.functions.z_order(col("x"), col("y"))).collect()
    assert(nz(0).isNullAt(0))
    val plan = Tables.lineitem(spark, sf0001)
      .select(graft.functions.z_order(col("l_partkey"), col("l_suppkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
    Graft.registerFunctions(spark)
    assert(spark.sql("SELECT z_order(5, 3)").as[Long].head() == 27L)
    assert(spark.sql("SELECT deletion_variant_hashes('abc', 1) AS hs")
      .as[Seq[Long]].head() ==
      graft.operators.EditDistanceJoin.deletionVariantHashes("abc", 1).toSeq)
  }

  test("profiler: per-column nulls and exact distincts; empty table well-formed") {
    val df = Seq(
      (1L, Option("a"), Option(1.5)),
      (2L, Option("a"), Option.empty[Double]),
      (3L, Option.empty[String], Option(2.5)),
      (4L, Option("b"), Option(1.5))
    ).toDF("id", "s", "v")
    val got = graft.operators.Profiler.profile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got("id") == ((4L, 0L, 4L)))
    assert(got("s") == ((4L, 1L, 2L)))    // nulls excluded from distinct
    assert(got("v") == ((4L, 1L, 2L)))
    val empty = graft.operators.Profiler.profile(df.limit(0))
      .as[(String, Long, Long, Long)].collect()
    assert(empty.length == 3 && empty.forall(t => t._2 == 0L && t._3 == 0L && t._4 == 0L))
  }

  test("curationFunnel: 5 cumulative stages, exact raw totals, monotone, stage-3 = composite") {
    val real = Tables.documents(spark, sf0001)
    val rows = graft.operators.Profiler.curationFunnel(real, "doc_id", "text")
      .orderBy("stage_ord").as[(Int, String, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((0, "raw"),
      (1, "exact_dedup"), (2, "lang_en"), (3, "quality"), (4, "min_tokens")))
    assert(rows(0)._3 == real.count())
    assert(rows(0)._4 ==
      real.select(sum(TextOps.tokenCount(col("text")))).head.getLong(0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"not monotone at stage ${b._1}")
    }
    // sf0.001's documents are fingerprint-unique (its duplicates are
    // NEAR-dups), so exact dedup keeps everything here — the genuine-drop
    // case is covered below on a constructed frame
    assert(rows(1)._3 == rows(0)._3 && rows(1)._3 > 0)
    // constructed exact dup: one cloned text must drop exactly one doc
    // at stage 1 and both its token copies from the stage-1 token mass
    val dup = real.limit(1).select(col("text")).as[String].head()
    val funnel2 = graft.operators.Profiler.curationFunnel(
        real.select(col("doc_id"), col("text"))
          .unionByName(Seq((900000L, dup)).toDF("doc_id", "text")),
        "doc_id", "text")
      .orderBy("stage_ord").as[(Int, String, Long, Long)].collect()
    assert(funnel2(0)._3 == rows(0)._3 + 1)
    assert(funnel2(1)._3 == rows(1)._3)
    // duplicate doc_id (a shard unioned twice): the survivor flag must
    // keep exactly ONE row of the tied fingerprint group — an
    // id === min(id) spelling would keep both and double-count
    val funnel3 = graft.operators.Profiler.curationFunnel(
        real.select(col("doc_id"), col("text"))
          .unionByName(real.select(col("doc_id"), col("text")).limit(1)),
        "doc_id", "text")
      .orderBy("stage_ord").as[(Int, String, Long, Long)].collect()
    assert(funnel3(0)._3 == rows(0)._3 + 1)
    assert(funnel3(1)._3 == rows(1)._3)
    // the 'quality' stage count IS the q_curation_pipeline survivor count
    // (same gates, same order) — the ledger and the composite can't drift
    assert(rows(3)._3 ==
      SparkEntry.queries("q_curation_pipeline")(spark, sf0001).count())
  }

  test("bigram stats: counts with multiplicity, unigram joins, top-N tie-break") {
    val df = Seq(
      (1L, "a b a b c"),     // bigrams: "a b","b a","a b","b c"
      (2L, "a b"),           // "a b"
      (3L, "z")              // too short -> none
    ).toDF("doc_id", "text")
    val got = TextOps.bigramStats(df, "text", 10)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // unigrams: a=3, b=3, c=1, z=1
    assert(got("a b") == ((3L, 3L, 3L)))
    assert(got("b a") == ((1L, 3L, 3L)))
    assert(got("b c") == ((1L, 3L, 1L)))
    assert(got.size == 3)
    // top-N cuts deterministically by (n_xy desc, bigram)
    val top1 = TextOps.bigramStats(df, "text", 1).as[(String, Long, Long, Long)].collect()
    assert(top1.map(_._1).toSeq == Seq("a b"))
  }

  test("heavy hitters: MG guarantee holds across partitionings; verified output exact") {
    // skewed synthetic stream: token i appears freq(i) times
    val freqs = Map("hot1" -> 400L, "hot2" -> 250L, "hot3" -> 150L) ++
      (1 to 200).map(i => s"tail$i" -> 3L).toMap
    val n = freqs.values.sum
    val k = 10
    val truth = freqs.filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(truth == Set("hot1", "hot2", "hot3")) // fixture sanity
    val rows = freqs.toSeq.flatMap { case (t, c) => Seq.fill(c.toInt)(t) }
    for (parts <- Seq(1, 7, 32)) {
      // different partitionings exercise different merge trees
      val df = spark.createDataset(rows).repartition(parts).toDF("token")
      val cands = df.agg(graft.functions.HeavyHitters
          .heavy_hitter_candidates(col("token"), k)).head().getSeq[String](0)
      assert(cands.size <= k, s"parts=$parts: state exceeded k")
      assert(truth.subsetOf(cands.toSet), s"parts=$parts: guarantee violated: $cands")
    }
    // end-to-end operator: exact verified output on a documents-shaped frame
    val docs = rows.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.heavyHitterTokens(docs, "text", k)
      .as[(String, Long)].collect().toMap
    assert(got.keySet == truth)
    assert(got("hot1") == 400L && got("hot2") == 250L && got("hot3") == 150L)
  }

  test("nfc_normalize: composes combining marks, ascii fast-path, SQL surface") {
    val decomposed = "e\u0301clair"   // e + combining acute
    val precomposed = "\u00e9clair"   // U+00E9
    val rows = Seq(
      (1L, decomposed),
      (2L, precomposed),
      (3L, "plain ascii stays"),
      (4L, "A\u030a"),                // A + combining ring -> U+00C5
      (5L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val got = rows.select(col("id"), graft.functions.nfc_normalize(col("s")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains(precomposed))
    assert(got(2L).contains(precomposed))
    assert(got(1L) == got(2L), "mixed normalization forms must collapse")
    assert(got(3L).contains("plain ascii stays"))
    assert(got(4L).contains("\u00c5"))
    assert(got(5L).isEmpty)
    // idempotent
    val twice = rows.filter(col("s").isNotNull)
      .select(graft.functions.nfc_normalize(
        graft.functions.nfc_normalize(col("s"))).as("a"),
        graft.functions.nfc_normalize(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(twice == 0L)
    Graft.registerFunctions(spark)
    assert(spark.sql("SELECT nfc_normalize('e\u0301') = '\u00e9'")
      .as[Boolean].head())
  }

  test("word_ngrams: parity with the HOF slice/concat_ws formulation") {
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]),
      (5L, Seq("only", "two"))
    ).toDF("id", "t")
    for (n <- 1 to 3) {
      val hof = when(size(col("t")) >= n,
        transform(sequence(lit(1), size(col("t")) - lit(n - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val got = rows.select(col("id"),
          graft.functions.word_ngrams(col("t"), n).as("native"), hof.as("ref"))
        .collect()
      // id=4 (null input) is the ONE documented divergence — asserted
      // separately below, excluded from strict parity here.
      got.filter(_.getLong(0) != 4L).foreach { r =>
        assert(r.get(1) == r.get(2), s"n=$n id=${r.getLong(0)}: " +
          s"${r.get(1)} vs ${r.get(2)}")
      }
    }
    // null array: HOF's `when` yields empty (size(null) is null -> otherwise
    // branch), native is null-intolerant -> documented difference, and the
    // only one: shingles() never feeds it a null (split never returns null).
    val nullRow = rows.filter(col("t").isNull)
      .select(graft.functions.word_ngrams(col("t"), 2)).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("salted count-distinct equals plain count_distinct for any salts") {
    val e = Tables.events(spark, sf0001)
    val exact = e.filter(col("user_id").isNotNull)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    for (salts <- Seq(1, 3, 16)) {
      val got = operators.Skew.saltedCountDistinct(e, "event_type", "user_id", salts)
        .as[(String, Long)].collect().toMap
      assert(got == exact, s"salts=$salts")
    }
    // nulls excluded, matching count_distinct
    val withNulls = Seq(("a", java.lang.Long.valueOf(1L)),
      ("a", null.asInstanceOf[java.lang.Long]), ("a", java.lang.Long.valueOf(1L)))
      .toDF("k", "v")
    assert(operators.Skew.saltedCountDistinct(withNulls, "k", "v", 4)
      .as[(String, Long)].collect().toSeq == Seq(("a", 1L)))
  }

  test("json roundtrip: write + schema read is lossless on documents") {
    val d = Tables.documents(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_json_spec")
    try {
      sources.Json.write(d, s"$tmp/docs")
      val back = sources.Json.readWithSchema(spark, s"$tmp/docs", d.schema)
      assert(back.schema == d.schema)
      val a = d.collect().map(_.toSeq).toSet
      val b = back.collect().map(_.toSeq).toSet
      assert(a == b)
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using(java.nio.file.Files.walk(tmp)) { st =>
        st.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("property: word_ngrams kernel equals sliding-window join") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val genTok = Gen.oneOf("a", "bb", "c", "", "d e", "😀")
    val prop = forAll(Gen.listOf(genTok), Gen.choose(1, 4)) { (toks, n) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = graft.functions.WordNGrams.compute(arr, n)
      val exp =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      Prop(got.numElements() == exp.length &&
        (0 until got.numElements()).forall(i =>
          got.getUTF8String(i).toString == exp(i)))
        .label(s"toks=$toks n=$n")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: DotProduct eval is the bit-exact sequential fold") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val genD = Gen.oneOf(Gen.choose(-1e3, 1e3), Gen.oneOf(0.0, -0.0, 1e300,
      -1e300, Double.MinPositiveValue, Double.NaN))
    val prop = forAll(Gen.choose(0, 8).flatMap(n =>
      Gen.zip(Gen.listOfN(n, genD), Gen.listOfN(n, genD)))) { case (a, b) =>
      val e = graft.functions.DotProduct(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType)))
      var s = 0.0
      a.indices.foreach(i => s += a(i) * b(i))
      val got = e.eval(null).asInstanceOf[Double]
      Prop(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(s)).label(s"a=$a b=$b got=$got exp=$s")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming fingerprint dedup matches batch fingerprint set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = operators.Dedup.byFingerprintStream(
        ms.toDS().toDF("doc_id", "text", "ts"), "text", "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("fp_dedup").start()
    try {
      // batch 1: "hello  WORLD" and "Hello world" normalize identically
      ms.addData((1L, "hello  WORLD", ts("2026-01-01 10:00:00")),
                 (2L, "Hello world", ts("2026-01-01 10:00:05")),
                 (3L, "something else", ts("2026-01-01 10:00:10")))
      q.processAllAvailable()
      // batch 2: a repeat within the watermark window is dropped; new text kept
      ms.addData((4L, "hello world", ts("2026-01-01 10:30:00")),
                 (5L, "brand new", ts("2026-01-01 10:30:01")))
      q.processAllAvailable()
      val emitted = spark.table("fp_dedup").select("doc_id", "fp")
        .as[(Long, String)].collect()
      // one survivor per distinct fingerprint, and it is a first arrival
      val batchFps = Seq("hello  WORLD", "something else", "brand new")
        .toDF("text").select(TextOps.fingerprint(col("text"))).as[String]
        .collect().toSet
      assert(emitted.map(_._2).toSet == batchFps)
      assert(emitted.length == batchFps.size)
      assert(!emitted.map(_._1).contains(4L), "duplicate doc 4 leaked through")
    } finally q.stop()
  }

  test("property: real_quick_ratio bound always dominates ro similarity") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val genS = Gen.listOf(Gen.oneOf("a", "b", "c", "xy", "😀", "")).map(_.mkString)
    val prop = forAll(genS, genS) { (a, b) =>
      // the bound expression's exact FP op order (see RoSimilarityBound)
      val la = a.codePointCount(0, a.length).toDouble
      val lb = b.codePointCount(0, b.length).toDouble
      val bound = 2.0 * math.min(la, lb) / (la + lb) * 100.0
      val sim = graft.functions.RatcliffObershelp.similarity(a, b)
      // NaN bound (both empty) is ordered above everything by Spark —
      // treat as pass-through here
      Prop(bound.isNaN || bound >= sim).label(s"a='$a' b='$b' bound=$bound sim=$sim")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("RoSimilarityBound rewrites threshold predicates, preserving results") {
    val rows = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamm"), (3L, "x"),
      (4L, "alpha beta"), (5L, "completely different string here")
    ).toDF("id", "key")
    val q = rows.as("a").join(rows.as("b"),
        graft.functions.string_similarity(col("a.key"), col("b.key")) >= 80.0 &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // the optimized plan carries the cheap length-bound conjunct
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("length("), opt.take(800))
    // and results equal the unguarded evaluation (rule disabled via a
    // session clone would be heavyweight; assert against scalar recompute)
    val got = q.as[(Long, Long)].collect().toSet
    val keys = rows.as[(Long, String)].collect()
    val exp = (for {
      (ia, ka) <- keys; (ib, kb) <- keys
      if ia < ib && graft.functions.RatcliffObershelp.similarity(ka, kb) >= 80.0
    } yield (ia, ib)).toSet
    assert(got == exp)
  }

  test("RoSimilarityBound reaches a fixpoint under interleaved ConstantFolding") {
    // Simulates the spark.sql.extensions path, where the rule shares a
    // fixed-point batch with ConstantFolding: a literal argument used to
    // defeat the exact-match guard detection and stack one guard per
    // iteration; both-literal arguments used to oscillate via
    // BooleanSimplification stripping the folded guard.
    import org.apache.spark.sql.catalyst.optimizer.{BooleanSimplification, ConstantFolding}
    val rows = Seq((1L, "alpha beta gamma")).toDF("id", "key")
    for (pred <- Seq(
        graft.functions.string_similarity(col("key"), lit("alpha beta gamm")) >= 80.0,
        graft.functions.string_similarity(lit("aa"), lit("ab")) >= 80.0)) {
      var plan = rows.filter(pred).queryExecution.analyzed
      val once = graft.plans.RoSimilarityBound(plan)
      for (_ <- 1 to 5) {
        plan = graft.plans.RoSimilarityBound(
          BooleanSimplification(ConstantFolding(graft.plans.RoSimilarityBound(plan))))
      }
      // stable: repeated folding+rewriting never grows the condition
      assert(plan.toString.length <=
        BooleanSimplification(ConstantFolding(once)).toString.length + 16,
        plan.toString.take(800))
    }
  }

  test("scrub stays whole-stage codegen (no eval-fallback operators)") {
    val plan = TextOps.piiCounts(Tables.documents(spark, sf0001), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan.take(500))
    assert(!plan.contains("BatchEvalPython"), plan.take(500))
  }
}
