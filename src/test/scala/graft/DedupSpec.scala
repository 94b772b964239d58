package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cp = Seq(
    ("1", "Acme GmbH", "DE001"),
    ("2", "Acme GmbH", "DE001"),   // exact dup on (name, iban)
    ("3", "Acme GmbH", "DE002"),   // same name, different iban
    ("4", "Umbrella Corp", ""),
    ("5", "Umbrella Corp", "")     // exact dup with empty iban
  ).toDF("id", "name", "iban")

  test("exact dedup on (name, iban) keeps one row per key") {
    val out = Dedup.exact(cp, Seq("name", "iban"))
    assert(out.count() == 3)
    assert(out.select("name", "iban").distinct().count() == 3)
  }

  test("dedup is idempotent") {
    val once = Dedup.exact(cp, Seq("name", "iban"))
    assert(Dedup.exact(once, Seq("name", "iban")).count() == once.count())
  }

  test("full-row distinct") {
    assert(Dedup.fullRow(cp.union(cp)).count() == cp.count())
  }

  test("canonical survivor picks smallest order value deterministically") {
    val out = Dedup.canonical(cp, Seq("name", "iban"), Seq(col("id")))
      .orderBy("id").select("id").as[String].collect()
    assert(out.toSeq == Seq("1", "3", "4"))
  }

  test("source-priority survivorship: preferred tier beats smaller id") {
    // same content in a crawl feed (tier 1, smaller id) and a curated
    // feed (tier 0, larger id): the curated copy must survive
    val docs = Seq(
      (1L, "shared body text", "crawl", 1L),
      (9L, "shared  BODY   text", "curated", 0L),  // same normalized form
      (5L, "unique content here", "crawl", 1L)
    ).toDF("doc_id", "text", "source", "tier")
    val fp = docs.withColumn("fp",
      graft.operators.TextOps.fingerprint(col("text")))
    val out = Dedup.canonical(fp, Seq("fp"), Seq(col("tier"), col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(9L, 5L))
  }

  test("dedup idempotence and monotonicity (seeded property)") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(200) + 1)(
        (rnd.nextInt(10).toString, rnd.nextInt(5).toString))
      val df = rows.toDF("k1", "k2")
      val once = Dedup.exact(df, Seq("k1", "k2"))
      assert(once.count() == Dedup.exact(once, Seq("k1", "k2")).count())
      assert(once.count() <= df.count())
      assert(once.count() == rows.distinct.size)
    }
  }

  test("bestByScore keeps the max-score row, ties broken by smallest tiebreak") {
    val df = Seq(
      ("k1", 1L, 0.5), ("k1", 2L, 0.9), ("k1", 3L, 0.9),  // max q=0.9, tie -> id 2
      ("k2", 4L, 0.1)
    ).toDF("key", "id", "q")
    val out = Dedup.bestByScore(df, Seq("key"), col("q"), col("id"))
      .select("key", "id").as[(String, Long)].collect().toMap
    assert(out == Map("k1" -> 2L, "k2" -> 4L))
  }

  test("incremental dedup keeps only keys absent from the corpus") {
    val corpus = Seq(("a", 1L), ("b", 2L)).toDF("fp", "old_id")
    val batch  = Seq(("b", 10L), ("c", 11L), ("c", 12L), ("d", 13L))
      .toDF("fp", "doc_id")
    val out = Dedup.incremental(batch, corpus, "fp")
    assert(out.columns.toSet == Set("fp", "doc_id"))
    // 'b' is in the corpus; both 'c' rows survive (batch-internal dups are
    // a separate concern for Dedup.exact), and 'd' survives
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L, 12L, 13L))
  }

  test("bucketed key index serves the anti join in place (equal results, no index-side shuffle)") {
    val corpus = Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("fp", "old_id")
    val batch  = Seq(("b", 10L), ("c", 11L), ("d", 13L)).toDF("fp", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx").toString
    Dedup.writeKeyIndexBucketed(corpus, "fp", dir, "graft_spec_fp_idx")
    val viaIndex = Dedup.incrementalAgainstIndex(batch, "fp", "graft_spec_fp_idx")
    val direct = Dedup.incremental(batch, corpus, "fp")
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex.select("doc_id").as[Long].collect().toSet == direct)
    // plan: with broadcast disabled (at real scale the index never fits
    // a broadcast), the anti join must consume the index's bucket
    // layout — exactly one fp exchange (the batch side), bucketed scan
    val broadcastConfs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = broadcastConfs.map(k => k -> spark.conf.getOption(k))
    broadcastConfs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val df = Dedup.incrementalAgainstIndex(batch, "fp", "graft_spec_fp_idx")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"), plan)
      assert(plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning(fp")) == 1, plan)
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP TABLE IF EXISTS graft_spec_fp_idx")
    }
  }

  test("appendKeyIndexBucketed: grown index equals the monolithic rebuild, bucketing intact") {
    // day 0 corpus; day 1 brings one duplicate ('b', must NOT re-enter
    // the index) and one novel key ('x', must enter and block day 2)
    val corpus0 = Seq(("a", 1L), ("b", 2L)).toDF("fp", "old_id")
    val day1 = Seq(("b", 20L), ("x", 21L)).toDF("fp", "doc_id")
    val day2 = Seq(("a", 30L), ("x", 31L), ("y", 32L)).toDF("fp", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_fpaidx").toString
    Dedup.writeKeyIndexBucketed(corpus0, "fp", s"$dir/grown", "graft_spec_fp_aidx")
    val novel = Dedup.incrementalAgainstIndex(day1, "fp", "graft_spec_fp_aidx")
    assert(novel.select("fp").as[String].collect().toSeq == Seq("x"))
    Dedup.appendKeyIndexBucketed(novel, "fp", "graft_spec_fp_aidx")
    val viaAppend = Dedup.incrementalAgainstIndex(day2, "fp", "graft_spec_fp_aidx")
    // 'a' blocked by day-0 files, 'x' blocked by the APPENDED file,
    // 'y' novel — proving served lookups reach the appended slice
    assert(viaAppend.select("doc_id").as[Long].collect().toSeq == Seq(32L))
    // monolithic rebuild over the same content agrees
    Dedup.writeKeyIndexBucketed(
      corpus0.select($"fp").unionByName(day1.select($"fp")),
      "fp", s"$dir/mono", "graft_spec_fp_aidx_mono")
    val viaMono = Dedup.incrementalAgainstIndex(day2, "fp", "graft_spec_fp_aidx_mono")
    assert(viaMono.select("doc_id").as[Long].collect().toSeq == Seq(32L))
    // the standing distinctness invariant survives the append: 'b' was
    // filtered by the serve contract, so no key appears twice
    val keys = spark.table("graft_spec_fp_aidx").as[String].collect().toSeq
    assert(keys.sorted == keys.distinct.sorted && keys.toSet == Set("a", "b", "x"))
    // and the anti join still consumes the bucket layout after appends
    val broadcastConfs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = broadcastConfs.map(k => k -> spark.conf.getOption(k))
    broadcastConfs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val df = Dedup.incrementalAgainstIndex(day2, "fp", "graft_spec_fp_aidx")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"), plan)
      assert(plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning(fp")) == 1, plan)
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP TABLE IF EXISTS graft_spec_fp_aidx")
      spark.sql("DROP TABLE IF EXISTS graft_spec_fp_aidx_mono")
    }
  }

  test("stats reports before/after counts") {
    val r = Dedup.stats(cp, Seq("name", "iban")).collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 3)
  }

  test("statsByGroup reports per-group dup rates") {
    val r = Dedup.statsByGroup(cp, "name", Seq("name", "iban"))
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("Acme GmbH") == ((3L, 2L, 1.0 / 3.0)))
    assert(r("Umbrella Corp") == ((2L, 1L, 0.5)))
  }

  test("surrogate ids are unique") {
    val out = Dedup.withSurrogateId(Tables.customer(spark, sf0001))
    assert(out.select("id").distinct().count() == out.count())
  }

  test("bucketed join plans with no exchange feeding the join") {
    val q = SparkEntry.queries("q_bucketed_join")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(400))
    // the ONLY exchange is the final per-segment aggregate; the join reads
    // bucket files directly on both sides
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges\n${plan.take(600)}")
    // and the result itself is right
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("all declared queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("streaming fingerprint gate: one survivor per normalized content, state evicted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = Dedup.byFingerprintStream(
      ms.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
      .select("doc_id", "fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("fp_gate").start()
    try {
      // same content in 3 normalized-equal forms + one distinct doc
      ms.addData(
        (ts("2026-01-01 10:00:00"), 1L, "Hello  World"),
        (ts("2026-01-01 10:00:01"), 2L, "hello world"),
        (ts("2026-01-01 10:00:02"), 3L, " HELLO WORLD "),
        (ts("2026-01-01 10:00:03"), 4L, "something else"))
      q.processAllAvailable()
      // push the watermark past the window: fp state for 10:00 is evicted
      ms.addData((ts("2026-01-01 11:00:00"), 5L, "later doc"))
      q.processAllAvailable()
      // a re-post AFTER eviction is re-admitted by design
      ms.addData((ts("2026-01-01 11:00:01"), 6L, "hello world"))
      q.processAllAvailable()
      val got = spark.table("fp_gate").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 4L, 5L, 6L), s"got $got")
      // batch parity inside one window: survivors' fp set == canonical's
      val batch = Seq((1L, "Hello  World"), (2L, "hello world"),
        (3L, " HELLO WORLD "), (4L, "something else"))
        .toDF("doc_id", "text")
        .withColumn("fp", graft.operators.TextOps.fingerprint(col("text")))
      val batchFps = Dedup.canonical(batch, Seq("fp"), Seq(col("doc_id")))
        .select("fp").as[String].collect().toSet
      val streamFps = spark.table("fp_gate")
        .filter(col("doc_id") <= 4L).select("fp").as[String].collect().toSet
      assert(streamFps == batchFps)
    } finally q.stop()
  }
}
