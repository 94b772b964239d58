package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf0001)

  test("tumblingAgg: window starts align to the hour, counts add up") {
    val out = EventOps.tumblingAgg(events)
    assert(out.agg(sum("n_events")).as[Long].head() == events.count())
    val starts = out.select("window_start_us").as[Long].collect()
    assert(starts.forall(_ % 3600000000L == 0L))
  }

  test("sessionize: per-user event counts conserved, sessions ordered") {
    val s = EventOps.sessionize(events)
    assert(s.agg(sum("n_events")).as[Long].head() == events.count())
    val bad = s.filter(col("session_end_us") < col("session_start_us")).count()
    assert(bad == 0)
    // session ids dense from 1 per user
    val ids = s.groupBy("user_id").agg(min("session_id").as("mn"), max("session_id").as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 1L || col("mx") =!= col("n")).count()
    assert(ids == 0)
  }

  test("jsonPropAgg extracts numeric props") {
    val out = EventOps.jsonPropAgg(events).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_k") <= r.getAs[Long]("n_events")))
  }

  test("stateful streaming (mapGroupsWithState) matches batch counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = spark.readStream.schema(rawSchema).parquet(dir.toString)
    val q = EventOps.userEventCountsStream(stream)
      .toDF("user_id", "n")
      .writeStream.outputMode("update")
      .format("memory").queryName("ev_state").start()
    try {
      q.processAllAvailable()
      // update mode emits one row per key per batch; the max is final state
      val got = spark.table("ev_state").groupBy("user_id").agg(max("n").as("n"))
        .as[(Long, Long)].collect().toMap
      val expected = events.groupBy("user_id").count()
        .as[(Long, Long)].collect().toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming sessionization emits all but each user's final session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
    val q = EventOps.sessionizeStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_sess").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_sess")
        .select("user_id", "session_id", "n_events", "session_start_us", "session_end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // Expected = batch sessions minus final sessions that are STILL OPEN
      // at the end: a user's last session is emitted too when the final
      // watermark (maxTs - gap) passed its timeout (end + gap), i.e. it
      // stays open only if end >= maxTs - 2*gap.
      val gapUs = 30L * 60L * 1000000L
      val maxTs = events.agg(max(unix_micros(col("ts")))).as[Long].head()
      val batch = EventOps.sessionize(events)
      val stillOpen = batch.groupBy("user_id").agg(max("session_id").as("session_id"))
        .join(batch, Seq("user_id", "session_id"))
        .filter(col("session_end_us") >= maxTs - 2 * gapUs)
        .select("user_id", "session_id")
      val expected = batch.join(stillOpen, Seq("user_id", "session_id"), "left_anti")
        .select("user_id", "session_id", "n_events", "session_start_us", "session_end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("funnel: strict stage order, gap enforcement, greedy-earliest start") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val gap24h = 86400000000L
    val ev = Seq(
      // user 1 converts fully in order
      (1L, "view", ts("2026-01-01 10:00:00")),
      (1L, "click", ts("2026-01-01 10:30:00")),
      (1L, "purchase", ts("2026-01-01 11:00:00")),
      // user 2's click precedes the view -> stalls at stage 1
      (2L, "click", ts("2026-01-01 09:00:00")),
      (2L, "view", ts("2026-01-01 10:00:00")),
      // user 3's click is outside the 24h gap -> stalls at stage 1
      (3L, "view", ts("2026-01-01 10:00:00")),
      (3L, "click", ts("2026-01-02 11:00:00")),
      // user 4 never views -> absent from the funnel entirely
      (4L, "click", ts("2026-01-01 10:00:00")),
      // user 5's purchase lands BETWEEN view and click -> stage 2 only
      (5L, "view", ts("2026-01-01 10:00:00")),
      (5L, "purchase", ts("2026-01-01 10:05:00")),
      (5L, "click", ts("2026-01-01 10:10:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), gap24h)
      .select("user_id", "stage_reached").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
    // greedy-earliest: t1 is the FIRST view even when a later view would
    // also admit the click
    val t1 = EventOps.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click"), gap24h)
      .filter(col("user_id") === 1L).select("t1_us").as[Long].head()
    assert(t1 == ts("2026-01-01 10:00:00").getTime * 1000L)
  }

  test("funnel matches an in-memory reference on random event logs") {
    val rnd = new scala.util.Random(7)
    val stages = Seq("view", "click", "purchase")
    val gapUs = 30L * 1000000L
    for (trial <- 1 to 5) {
      val evs = Seq.fill(40)((1L + rnd.nextInt(5),
        stages(rnd.nextInt(3)), 1L + rnd.nextInt(90)))
      // reference: greedy-earliest chain per user, in plain Scala
      val byUser = evs.groupBy(_._1)
      val ref = byUser.flatMap { case (u, es) =>
        def minAfter(t: String, lo: Long): Option[Long] = {
          val c = es.filter(e => e._2 == t && e._3 * 1000000L > lo &&
            e._3 * 1000000L <= lo + gapUs).map(_._3 * 1000000L)
          if (c.isEmpty) None else Some(c.min)
        }
        val t1 = es.filter(_._2 == "view").map(_._3 * 1000000L)
          .minOption
        t1.map { s1 =>
          val s2 = minAfter("click", s1)
          val s3 = s2.flatMap(minAfter("purchase", _))
          (u, (Some(s1): Option[Long], s2, s3,
            1L + s2.size + s3.size))
        }
      }
      val df = evs.map { case (u, t, sec) =>
        (u, t, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)))
      }.toDF("user_id", "event_type", "ts")
      val got = EventOps.funnel(df, "user_id", "event_type", "ts", stages, gapUs)
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got == ref, s"trial $trial events=$evs")
    }
  }

  test("retention: week-0 is always full; later offsets count distinct actives") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two users born in the same epoch week; one returns the next week
    // (twice — must count once), the other never does
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-08 10:00:00")),
      (1L, ts("2026-01-09 10:00:00")),
      (2L, ts("2026-01-02 10:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.retention(ev, "user_id", "ts", 8)
      .select("week_offset", "n_active", "n_cohort", "retention")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5)), got)
    // week-0 retention is exactly 1.0 for every cohort on the fixture
    val full = EventOps.retention(Tables.events(spark, sf0001), "user_id", "ts", 8)
      .filter(col("week_offset") === 0 && col("retention") =!= 1.0).count()
    assert(full == 0)
  }

  test("ro_similarity is callable from SQL after registration") {
    Graft.registerFunctions(spark)
    val r = spark.sql("SELECT ro_similarity('apple', 'appel') AS s").collect()(0).getDouble(0)
    assert(math.abs(r - 80.0) < 1e-9)
    val rn = spark.sql("SELECT ro_similarity(NULL, 'x') AS s").collect()(0)
    assert(rn.isNullAt(0))
    val mk = spark.sql(
      "SELECT min_3(v) AS m FROM VALUES (5L),(1L),(9L),(3L) AS t(v)")
      .as[Seq[Long]].collect()(0)
    assert(mk == Seq(1L, 3L, 5L))
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) covers the batch key set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
    val q = EventOps.dedupHourlyStream(stream)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("hr")).as("hour_us"), col("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_dedup")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_dedup")
      val batch = EventOps.dedupHourly(events)
      // exactly one survivor per key, keys identical to the batch twin;
      // survivor identity is arrival-order-dependent, so assert membership
      // (the survivor is SOME event of its key group), not min(event_id)
      assert(got.count() == batch.count())
      val keyCols = Seq("user_id", "event_type", "hour_us")
      assert(got.select(keyCols.map(col): _*).except(
        batch.select(keyCols.map(col): _*)).count() == 0)
      val valid = events.select(col("user_id"), col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"), col("event_id"))
      assert(got.except(valid).count() == 0)
    } finally q.stop()
  }

  test("streaming tumbling agg: late data inside the watermark is aggregated, beyond it is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def us(s: String) = ts(s).getTime * 1000L
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = EventOps.tumblingAggStream(ms.toDS().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_late").start()
    try {
      // batch 1 advances the watermark to 20:00 - 2h = 18:00
      ms.addData((ts("2026-01-01 10:15:00"), "a", 1.0),
                 (ts("2026-01-01 20:00:00"), "a", 2.0))
      q.processAllAvailable()
      // batch 2: out-of-order events. "b" @18:30 is late but its window
      // [18:00,19:00) ends AFTER the 18:00 watermark -> must be kept;
      // "c" @15:30's window [15:00,16:00) closed before it -> must be dropped.
      ms.addData((ts("2026-01-01 18:30:00"), "b", 3.0),
                 (ts("2026-01-01 15:30:00"), "c", 4.0))
      q.processAllAvailable()
      // batch 3 pushes the watermark far ahead so every surviving window flushes
      ms.addData((ts("2026-01-02 06:00:00"), "a", 5.0))
      q.processAllAvailable()
      val got = spark.table("ev_late")
        .select("window_start_us", "event_type", "n_events", "sum_value_cents")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == Set(
        (us("2026-01-01 10:00:00"), "a", 1L, 100L),
        (us("2026-01-01 18:30:00") - 1800L * 1000000L, "b", 1L, 300L),
        (us("2026-01-01 20:00:00"), "a", 1L, 200L)))
      assert(!got.exists(_._2 == "c"), "an event older than the watermark leaked in")
    } finally q.stop()
  }

  test("streaming funnel equals the batch funnel on a bounded fixture") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val gap24h = 86400000000L
    val stages = Seq("view", "click", "purchase")
    // the batch suite's hand fixture, fed OUT OF ORDER within users to
    // exercise the buffered greedy fold (user 1's click arrives before
    // its view; user 5's purchase after its click)
    val batch1 = Seq(
      (1L, "click", ts("2026-01-01 10:30:00")),
      (1L, "view", ts("2026-01-01 10:00:00")),
      (2L, "click", ts("2026-01-01 09:00:00")),
      (3L, "view", ts("2026-01-01 10:00:00")),
      (4L, "click", ts("2026-01-01 10:00:00")),
      (5L, "view", ts("2026-01-01 10:00:00")))
    val batch2 = Seq(
      (1L, "purchase", ts("2026-01-01 11:00:00")),
      (2L, "view", ts("2026-01-01 10:00:00")),
      (3L, "click", ts("2026-01-02 11:00:00")),
      (5L, "click", ts("2026-01-01 10:10:00")),
      (5L, "purchase", ts("2026-01-01 10:05:00")))
    val sentinelUid = 999L
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventOps.funnelStream(
        ms.toDS().toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages, gap24h,
        "2 days") // covers the cross-batch disorder: batch 2 reaches back
                  // ~25h behind batch 1's max event time
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_funnel").start()
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      ms.addData(batch2: _*)
      q.processAllAvailable()
      // two sentinel rounds: the first advances the watermark past every
      // user's t_reached + gap, the second delivers the fired timeouts
      ms.addData((sentinelUid, "view", ts("2026-01-20 00:00:00")))
      q.processAllAvailable()
      ms.addData((sentinelUid, "view", ts("2026-01-21 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("ev_funnel")
        .as[(Long, Seq[Long], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val ev = (batch1 ++ batch2).toDF("user_id", "event_type", "ts")
      val expected = EventOps.funnel(ev, "user_id", "event_type", "ts",
          stages, gap24h)
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
        .collect()
        .map(r => r._1 -> ((Seq(r._2, r._3, r._4).flatten, r._5))).toMap
      assert(got == expected)
      assert(got(1L)._2 == 3L && got(5L)._2 == 2L && !got.contains(4L))
      assert(!got.contains(sentinelUid), "open sentinel funnel must not emit")
    } finally q.stop()
  }

  test("streaming funnel: an emitted user never re-opens on later stage-1 events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val gap24h = 86400000000L
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventOps.funnelStream(
        ms.toDS().toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("view", "click"), gap24h, "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_funnel_once").start()
    try {
      // user 7 converts; sentinels push the watermark so it finalizes
      ms.addData((7L, "view", ts("2026-01-01 10:00:00")),
        (7L, "click", ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      ms.addData((99L, "view", ts("2026-01-05 00:00:00")))
      q.processAllAvailable()
      ms.addData((99L, "view", ts("2026-01-06 00:00:00")))
      q.processAllAvailable()
      assert(spark.table("ev_funnel_once")
        .filter(col("user_id") === 7L).count() == 1)
      // a fresh stage-1 event for the EMITTED user, plus enough watermark
      // movement to finalize any re-opened state...
      ms.addData((7L, "view", ts("2026-01-10 00:00:00")))
      q.processAllAvailable()
      ms.addData((99L, "view", ts("2026-01-15 00:00:00")))
      q.processAllAvailable()
      ms.addData((99L, "view", ts("2026-01-16 00:00:00")))
      q.processAllAvailable()
      // ...must NOT yield a second row: batch semantics emit exactly one
      // funnel per converting user (the globally earliest chain)
      assert(spark.table("ev_funnel_once")
        .filter(col("user_id") === 7L).count() == 1)
    } finally q.stop()
  }

  test("streaming retention cells rebuild the exact batch retention matrix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(week: Long, dayOff: Long) = new java.sql.Timestamp(
      (week * 7L + dayOff) * 86400L * 1000L)
    // users 1-3 cohort in week 0/1; duplicate (user, week) activity across
    // batches must emit each cell exactly once
    val batch1 = Seq((1L, ts(0, 1)), (1L, ts(0, 3)), (2L, ts(0, 2)), (3L, ts(1, 0)))
    val batch2 = Seq((1L, ts(1, 2)), (1L, ts(0, 5)), (2L, ts(2, 1)), (3L, ts(1, 6)))
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    // deliberately NOT named "ts": round-8 review caught the week
    // expression hard-coding the column name
    val q = EventOps.activityCellsStream(
        ms.toDS().toDF("user_id", "event_ts"), "user_id", "event_ts")
      .toDF("user_id", "w")
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_cells").start()
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      ms.addData(batch2: _*)
      q.processAllAvailable()
      val cells = spark.table("ev_cells")
      // exactly-once per distinct cell
      assert(cells.count() == cells.distinct().count())
      val got = EventOps.retentionFromCells(cells, 8)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val ev = (batch1 ++ batch2).toDF("user_id", "ts")
      val expected = EventOps.retention(ev, "user_id", "ts", 8)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == expected && got.nonEmpty)
    } finally q.stop()
  }

  test("streaming tumbling agg equals the batch result") {
    // FileStreamSource wants a directory; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    // raw schema varies by fixture generation; one shared normalizer
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
    val q = EventOps.tumblingAggStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_win")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_win")
        .orderBy("window_start_us", "event_type").collect().toSeq
      val expected = EventOps.tumblingAgg(events).drop("n_users")
        .orderBy("window_start_us", "event_type").collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("built-in session_window agrees with custom sessionize on (start, count)") {
    val custom = EventOps.sessionize(events)
      .select("user_id", "session_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val builtin = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(custom == builtin)
  }

  test("stream-stream interval join: in-interval pairs only, both directions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val msL = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val msR = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val joined = EventOps.intervalJoinStream(
      msL.toDS().toDF("ts", "user_id", "click_id"),
      msR.toDS().toDF("ts", "user_id", "conv_id"), "user_id")
      .select(col("l.click_id"), col("r.conv_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ev_ssj").start()
    try {
      msL.addData((ts("2026-01-01 10:00:00"), 1L, 100L),
                  (ts("2026-01-01 12:00:00"), 2L, 200L))
      msR.addData(
        (ts("2026-01-01 10:05:00"), 1L, 900L),   // +5m: inside
        (ts("2026-01-01 09:55:00"), 1L, 901L),   // -5m: inside (before-bound)
        (ts("2026-01-01 10:30:00"), 1L, 902L),   // +30m: outside the interval
        (ts("2026-01-01 12:05:00"), 3L, 903L))   // in-interval ts, wrong key
      q.processAllAvailable()
      val got = spark.table("ev_ssj").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 900L), (100L, 901L)))
      // batch equivalence of the same condition
      val batch = Seq((ts("2026-01-01 10:00:00"), 1L, 100L),
                      (ts("2026-01-01 12:00:00"), 2L, 200L))
        .toDF("ts", "user_id", "click_id").as("l")
        .join(Seq((ts("2026-01-01 10:05:00"), 1L, 900L),
                  (ts("2026-01-01 09:55:00"), 1L, 901L),
                  (ts("2026-01-01 10:30:00"), 1L, 902L),
                  (ts("2026-01-01 12:05:00"), 3L, 903L))
          .toDF("ts", "user_id", "conv_id").as("r"),
          col("l.user_id") === col("r.user_id") &&
            col("r.ts") >= col("l.ts") - expr("INTERVAL 10 minutes") &&
            col("r.ts") <= col("l.ts") + expr("INTERVAL 10 minutes"))
        .select(col("l.click_id"), col("r.conv_id"))
        .as[(Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join; unmatched keys survive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "cohort")
    val ms = MemoryStream[(Long, String)]
    val q = EventOps.enrichStream(ms.toDS().toDF("user_id", "event_type"), dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_enrich").start()
    try {
      ms.addData((1L, "view"), (2L, "click"), (9L, "view"))
      q.processAllAvailable()
      val got = spark.table("ev_enrich")
        .as[(Long, String, Option[String])].collect().toSet
      val batch = Seq((1L, "view"), (2L, "click"), (9L, "view"))
        .toDF("user_id", "event_type")
        .join(broadcast(dim), Seq("user_id"), "left")
        .as[(Long, String, Option[String])].collect().toSet
      assert(got == batch)
      assert(got.contains((9L, "view", None)))   // left semantics: no dim row
    } finally q.stop()
  }
}
