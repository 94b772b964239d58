package graft

import graft.operators.{DataChecks, Sampling}
import org.apache.spark.sql.functions._

class DataChecksSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, 10.0, "A"), (2L, -5.0, "B"), (3L, 0.0, "A"), (4L, 7.5, null)
  ).toDF("id", "amount", "tag")

  test("audit counts violations and reports the min violating key") {
    val out = DataChecks.audit(frame, "id", Seq(
      "amount_positive" -> (col("amount") > 0),
      "tag_not_null" -> col("tag").isNotNull,
      "id_positive" -> (col("id") > 0)))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("amount_positive") == ((4L, 2L, Some(2L)))) // -5 and 0
    assert(out("tag_not_null") == ((4L, 1L, Some(4L))))
    assert(out("id_positive") == ((4L, 0L, None)))
  }

  test("a null predicate result counts as a violation (null-hostile)") {
    // amount > 5 is NULL for a null amount — must be reported, not skipped
    val df = Seq((1L, Some(10.0)), (2L, None)).toDF("id", "amount")
    val out = DataChecks.audit(df, "id", Seq("amount_gt5" -> (col("amount") > 5)))
      .as[(String, Long, Long, Option[Long])].head()
    assert(out == (("amount_gt5", 2L, 1L, Some(2L))))
  }

  test("audit is one aggregate over one scan (no per-rule scans)") {
    val rules = Seq("a" -> (col("amount") > 0), "b" -> col("tag").isNotNull,
      "c" -> (col("id") < 100))
    val plan = DataChecks.audit(frame, "id", rules)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) <= 1 &&
      !plan.contains("Union"), plan)
  }

  test("rejects rule names that cannot be stack literals") {
    intercept[IllegalArgumentException] {
      DataChecks.audit(frame, "id", Seq("bad name'" -> (col("id") > 0)))
    }
  }

  test("fkViolations reports orphans in the audit row shape") {
    val child = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("ck", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = DataChecks.fkViolations(child, "fk", "ck", parent, "pk", "fk_ok")
      .as[(String, Long, Long, Option[Long])].head()
    assert(out == (("fk_ok", 3L, 1L, Some(3L))))
  }

  test("kSuppress/kSuppressed partition the corpus by QI group size") {
    import graft.operators.Privacy
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),   // group of 3
      (4L, "de", "a"), (5L, "de", "a"),                    // group of 2
      (6L, "fr", "b")                                      // singleton
    ).toDF("doc_id", "lang", "source")
    val kept = Privacy.kSuppress(df, Seq("lang", "source"), 3L)
      .select("doc_id").as[Long].collect().toSet
    val dropped = Privacy.kSuppressed(df, Seq("lang", "source"), 3L)
      .select("doc_id", "qi_group_n").as[(Long, Long)].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    assert(dropped == Set((4L, 2L), (5L, 2L), (6L, 1L)))
    // exact partition: nothing lost, nothing duplicated
    assert(kept.size + dropped.size == 6)
    // k=1 keeps everything
    assert(Privacy.kSuppress(df, Seq("lang", "source"), 1L).count() == 6)
  }

  test("kSuppress counts NULL quasi-identifiers as a group of their own") {
    import graft.operators.Privacy
    // null lang is a QI value like any other: the three (null, "a") rows
    // form a group of 3, and the lone (null, null) row is a singleton
    // that must land in the SUPPRESSED partition, not vanish.
    val df = Seq(
      (1L, Option("en"), Option("a")), (2L, Option("en"), Option("a")),
      (3L, None: Option[String], Option("a")),
      (4L, None: Option[String], Option("a")),
      (5L, None: Option[String], Option("a")),
      (6L, None: Option[String], None: Option[String])
    ).toDF("doc_id", "lang", "source")
    val kept = Privacy.kSuppress(df, Seq("lang", "source"), 3L)
      .select("doc_id").as[Long].collect().toSet
    val dropped = Privacy.kSuppressed(df, Seq("lang", "source"), 3L)
      .select("doc_id", "qi_group_n").as[(Long, Long)].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
    assert(dropped == Set((1L, 2L), (2L, 2L), (6L, 1L)))
    // exact partition even with nulls: kept + suppressed == input
    assert(kept.size + dropped.size == 6)
  }

  test("epochRepeat materializes per-stratum repeats; unknown strata get 1") {
    val df = Seq((1L, "de"), (2L, "en"), (3L, "xx")).toDF("doc_id", "lang")
    val out = Sampling.epochRepeat(df, "lang", Map("de" -> 3, "en" -> 2))
      .select("doc_id", "epoch").as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (3L, 1)))
    intercept[IllegalArgumentException] {
      Sampling.epochRepeat(df, "lang", Map("de" -> 0))
    }
  }
}
