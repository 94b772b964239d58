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
