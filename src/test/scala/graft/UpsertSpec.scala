package graft

import org.apache.spark.sql.functions._
import graft.operators.{Skew, Upsert}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val current = Seq(
    (1L, "a", 100L),
    (2L, "b", 200L),
    (3L, "c", 300L)
  ).toDF("k", "name", "cents")

  test("upsert: updates replace, inserts append, untouched rows pass through") {
    val updates = Seq(
      (2L, "b2", 999L),   // replaces key 2
      (4L, "d", 400L)     // new key
    ).toDF("k", "name", "cents")
    val got = Upsert.upsert(current, updates, Seq("k"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 100L), (2L, "b2", 999L), (3L, "c", 300L), (4L, "d", 400L)))
  }

  test("applyCdc: deletes vanish, upserts replace/insert, one pass") {
    val changes = Seq(
      (1L, "", 0L, "d"),       // delete key 1 (non-key payload ignored)
      (3L, "c2", 333L, "u"),   // replace key 3
      (5L, "e", 500L, "u")     // insert key 5
    ).toDF("k", "name", "cents", "op")
    val got = Upsert.applyCdc(current, changes, Seq("k"), "op")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((2L, "b", 200L), (3L, "c2", 333L), (5L, "e", 500L)))
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val updates = Seq((2L, "b2", 999L)).toDF("k", "name", "cents")
    val once = Upsert.upsert(current, updates, Seq("k"))
    val twice = Upsert.upsert(once, updates, Seq("k"))
    assert(once.as[(Long, String, Long)].collect().toSet ==
      twice.as[(Long, String, Long)].collect().toSet)
  }

  test("snapshotDiff: added/removed/changed only, unchanged dropped, null-safe") {
    val prev = Seq(
      (1L, Option("a"), 100L),
      (2L, Option("b"), 200L),
      (3L, Option.empty[String], 300L),   // null payload field
      (4L, Option("d"), 400L)
    ).toDF("k", "name", "cents")
    val cur = Seq(
      (1L, Option("a"), 100L),            // unchanged -> dropped
      (2L, Option("b"), 999L),            // changed (value)
      (3L, Option.empty[String], 300L),   // unchanged, null <=> null -> dropped
      (5L, Option("e"), 500L)             // added; 4 removed
    ).toDF("k", "name", "cents")
    val got = Upsert.snapshotDiff(prev, cur, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (4L, "removed"), (5L, "added")))
    // null -> non-null payload transition is a change, not unchanged
    val cur2 = Seq((3L, Option("now-set"), 300L)).toDF("k", "name", "cents")
    val got2 = Upsert.snapshotDiff(prev.filter(col("k") === 3L), cur2, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got2 == Set((3L, "changed")))
  }

  test("snapshotDiff of a snapshot with itself is empty") {
    val c = Tables.customer(spark, sf0001)
    assert(Upsert.snapshotDiff(c, c, Seq("c_custkey")).count() == 0L)
  }

  test("streaming CDC apply via foreachBatch equals the batch-applied state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_stream")
    root.toFile.deleteOnExit()
    val state = s"$root/state"
    Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "cents")
      .write.mode("overwrite").parquet(state)
    val ms = MemoryStream[(Long, Long, String)]
    // the standard exactly-once-per-micro-batch shape: foreachBatch folds
    // each change batch into the standing snapshot with applyCdc.
    // localCheckpoint materializes the next state BEFORE the overwrite —
    // a lazy plan would read the very directory it is replacing (a real
    // table format or versioned-dir swap is the production form).
    val q = ms.toDS().toDF("k", "cents", "op").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = Upsert.applyCdc(spark.read.parquet(state), batch,
          Seq("k"), "op").localCheckpoint(true)
        next.write.mode("overwrite").parquet(state)
        ()
      }
      .start()
    try {
      ms.addData((2L, 999L, "u"), (4L, 400L, "u"))   // update 2, insert 4
      q.processAllAvailable()
      ms.addData((1L, 0L, "d"), (4L, 444L, "u"))     // delete 1, re-update 4
      q.processAllAvailable()
      val got = spark.read.parquet(state).as[(Long, Long)].collect().toSet
      assert(got == Set((2L, 999L), (3L, 300L), (4L, 444L)))
    } finally q.stop()
  }

  test("cdcApplyStream (flatMapGroupsWithState) equals the batch-applied state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = Upsert.cdcApplyStream(ms.toDS().toDF("k", "seq", "v", "op"))
      .toDF("k", "last_seq", "v")
      .writeStream.outputMode("update").format("memory")
      .queryName("cdc_stream_tbl").start()
    val b1 = Seq((1L, 1L, 100L, "u"), (2L, 2L, 200L, "u"), (3L, 3L, 300L, "u"))
    // batch 2: update 2, insert-then-update 4 IN ONE batch, delete 1,
    // plus a STALE replay of key 2 (seq 1 < folded 4) that must no-op
    val b2 = Seq((2L, 4L, 999L, "u"), (4L, 5L, 400L, "u"), (1L, 6L, 0L, "d"),
      (4L, 7L, 444L, "u"), (2L, 1L, 5L, "u"))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      // the sink's materialization: each key's row at its max last_seq
      val got = spark.table("cdc_stream_tbl")
        .as[(Long, Long, Option[Long])].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2)._3 }
      // batch twin: fold the same batches with applyCdc, collapsing each
      // batch to its latest change per key first (applyCdc's one-row-per-
      // key contract; the stream folds by seq internally)
      val expected = Seq(b1, b2).foldLeft(
        Seq.empty[(Long, Long)].toDF("k", "v")) { (cur, b) =>
        val latest = b.groupBy(_._1).map(_._2.maxBy(_._2)).toSeq
          .map { case (k, _, v, op) => (k, v, op) }
        Upsert.applyCdc(cur, latest.toDF("k", "v", "op"), Seq("k"), "op")
      }.as[(Long, Long)].collect().toMap
      val live = got.collect { case (k, Some(v)) => k -> v }.toMap
      assert(live == expected)                  // live keys identical
      assert(got(1L).isEmpty)                   // delete emitted a tombstone
      assert(got(2L) == Some(999L))             // stale replay did not win
    } finally q.stop()
  }

  test("nullTolerantLeftJoin equals the plain left join, nulls bypass") {
    val left = Seq(
      (1L, Option(10L), "a"),
      (2L, Option.empty[Long], "b"),   // null key -> bypass, padded
      (3L, Option(99L), "c")           // no match -> padded
    ).toDF("rid", "k", "payload")
    val right = Seq((10L, "dim10"), (20L, "dim20")).toDF("k", "attr")
    val leftK = left.select(col("rid"), col("k"), col("payload"))
    val got = Skew.nullTolerantLeftJoin(leftK, right, "k")
      .select("rid", "k", "payload", "attr")
      .as[(Long, Option[Long], String, Option[String])].collect().toSet
    val plain = leftK.join(right, Seq("k"), "left")
      .select("rid", "k", "payload", "attr")
      .as[(Long, Option[Long], String, Option[String])].collect().toSet
    assert(got == plain)
    assert(got.contains((2L, None, "b", None)))
  }

  test("saltedJoin equals the plain inner join for any salts, incl. dup rows") {
    val probe = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
    val build = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("p"))
    val plain = probe.join(build, Seq("k"))
      .groupBy("p").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, Long, Double)].collect().map { case (p, n, s) => p -> ((n, s)) }.toMap
    for (salts <- Seq(1, 4)) {
      val got = Skew.saltedJoin(probe, build, Seq("k"), salts)
        .groupBy("p").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .as[(String, Long, Double)].collect().map { case (p, n, s) => p -> ((n, s)) }.toMap
      assert(got.view.mapValues(_._1).toMap == plain.view.mapValues(_._1).toMap,
        s"row counts diverge at salts=$salts")
      got.foreach { case (p, (_, s)) =>
        assert(math.abs(s - plain(p)._2) < 1e-6 * math.abs(plain(p)._2), s"p=$p salts=$salts")
      }
    }
    // duplicate probe rows: each matches once per build copy of its salt
    val dupProbe = Seq((1L, "x"), (1L, "x"), (1L, "x")).toDF("k", "t")
    val oneBuild = Seq((1L, "only")).toDF("k", "b")
    assert(Skew.saltedJoin(dupProbe, oneBuild, Seq("k"), 4).count() == 3L)
  }
}
