package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, user, ts); right: (user, ts, payload)
  private lazy val left = Seq(
    (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 300L),
    (4L, "u2", 50L),                     // u2 has no right rows at/before 50
    (5L, "u2", 500L),
    (6L, "u3", 10L)                      // u3 has no right rows at all
  ).toDF("id", "user", "ts")
  private lazy val right = Seq(
    ("u1", 100L, "a"),                   // equal ts -> inclusive match for id 1
    ("u1", 250L, "b"),
    ("u2", 400L, "c")
  ).toDF("user", "ts", "payload")

  test("most recent right row at-or-before each left row; inclusive ties; null when none") {
    val out = AsofJoin.asofJoin(left, right, Seq("user"), "ts")
      .select("id", "asof_payload", "asof_ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(1L) == (Some("a"), Some(100L)))  // equal ts matches (inclusive)
    assert(out(2L) == (Some("a"), Some(100L)))  // 250 is in the future
    assert(out(3L) == (Some("b"), Some(250L)))  // latest wins
    assert(out(4L) == (None, None))             // right row only at 400
    assert(out(5L) == (Some("c"), Some(400L)))
    assert(out(6L) == (None, None))             // key absent from right
  }

  test("left row count and columns are preserved (left-join semantics)") {
    val out = AsofJoin.asofJoin(left, right, Seq("user"), "ts")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("id", "user", "ts", "asof_ts", "asof_payload"))
  }

  test("matches a brute-force per-row maximum on real events data") {
    val e = Tables.events(spark, sf0001)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type"), unix_micros(col("ts")).as("us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("us").as("ts_us"))
      .agg(max(col("event_id")).as("purchase_id"))
    val got = AsofJoin.asofJoin(views, purchases, Seq("user_id"), "ts_us")
      .select("event_id", "asof_purchase_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = views.collect().map { r =>
      val (id, uid, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cand = ps.getOrElse(uid, Array.empty).filter(_._2 <= ts)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(p => (p._2, p._3))._3))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
