package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TimeRangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev: DataFrame = {
    val rnd = new scala.util.Random(11)
    (0 until 300).map(i =>
      (i.toLong, s"u${rnd.nextInt(6)}", rnd.nextInt(4000).toLong))
      .toDF("id", "user", "us")
  }

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString
      .contains(graft.plans.TimeRangeJoinRewrite.BucketCol)

  private def assertEquiPlan(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(rewritten(df), plan)
  }

  private def naiveKeyless(w: Long, strict: Boolean = false): Set[(Long, Long)] = {
    val rows = ev.as[(Long, String, Long)].collect()
    (for {
      a <- rows; b <- rows
      if a._1 < b._1
      gap = math.abs(a._3 - b._3)
      if (strict && gap < w) || (!strict && gap <= w)
    } yield (a._1, b._1)).toSet
  }

  test("keyless abs-bounded theta join becomes an equi join with identical results") {
    val joined = ev.as("a").join(ev.as("b"),
      col("a.id") < col("b.id") && abs(col("a.us") - col("b.us")) <= 40)
      .select(col("a.id"), col("b.id"))
    assertEquiPlan(joined)
    assert(joined.as[(Long, Long)].collect().toSet == naiveKeyless(40))
  }

  test("SQL form is rewritten too (rule reaches spark.sql plans)") {
    ev.createOrReplaceTempView("rjr_events")
    val joined = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b FROM rjr_events a JOIN rjr_events b
        |ON a.id < b.id AND abs(a.us - b.us) <= 40""".stripMargin)
    assertEquiPlan(joined)
    assert(joined.as[(Long, Long)].collect().toSet == naiveKeyless(40))
  }

  test("strict < bound and reversed literal-first comparison are both rewritten") {
    val j1 = ev.as("a").join(ev.as("b"),
      col("a.id") < col("b.id") && abs(col("a.us") - col("b.us")) < 40)
      .select(col("a.id"), col("b.id"))
    assertEquiPlan(j1)
    assert(j1.as[(Long, Long)].collect().toSet == naiveKeyless(40, strict = true))
    ev.createOrReplaceTempView("rjr_events")
    val j2 = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b FROM rjr_events a JOIN rjr_events b
        |ON a.id < b.id AND 40 >= abs(a.us - b.us)""".stripMargin)
    assertEquiPlan(j2)
    assert(j2.as[(Long, Long)].collect().toSet == naiveKeyless(40))
  }

  test("a join with an equi conjunct keeps its hash-join plan (no inflation)") {
    val keyed = ev.as("a").join(ev.as("b"),
      col("a.user") === col("b.user") && col("a.id") < col("b.id") &&
        abs(col("a.us") - col("b.us")) <= 40)
      .select(col("a.id"), col("b.id"))
    assert(!rewritten(keyed))
    // ... and the results are of course still correct
    val rows = ev.as[(Long, String, Long)].collect()
    val expected = (for {
      a <- rows; b <- rows
      if a._2 == b._2 && a._1 < b._1 && math.abs(a._3 - b._3) <= 40
    } yield (a._1, b._1)).toSet
    assert(keyed.as[(Long, Long)].collect().toSet == expected)
  }

  test("rule leaves outer joins and non-literal bounds alone") {
    val outer = ev.as("a").join(ev.as("b"),
      abs(col("a.us") - col("b.us")) <= 40, "left")
    assert(!rewritten(outer))
    val nonLit = ev.as("a").join(ev.as("b"),
      col("a.id") < col("b.id") &&
        abs(col("a.us") - col("b.us")) <= col("b.us"))
    assert(!rewritten(nonLit))
  }

  test("property: the bucket-adjacency lemma holds for random longs (incl. negatives)") {
    // soundness core: |a-b| <= w  =>  bucket(a) within 1 of bucket(b),
    // with bucket(x) = (x - pmod(x, w)) div w — the exact arithmetic the
    // rule emits (true floor for any sign, no double rounding).
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    def bucket(x: Long, w: Long): Long = {
      val p = ((x % w) + w) % w
      (x - p) / w
    }
    val genW = Gen.oneOf(Gen.choose(1L, 1000L),
      Gen.oneOf(1L, 60L, 600L, 86400L, 1000000L, 3600L * 1000000L))
    // nanosecond-epoch magnitudes included: the no-double argument must
    // hold where floor(x / w.toDouble) would already be wrong
    val genX = Gen.oneOf(Gen.choose(-1000000L, 1000000L),
      Gen.choose(-4e18.toLong, 4e18.toLong))
    val prop = forAll(genW, genX, Gen.choose(-1.0, 1.0)) { (w, x, f) =>
      val y = x + math.round(f * w)   // |x - y| <= w by construction
      val d = math.abs(bucket(x, w) - bucket(y, w))
      Prop(d <= 1).label(s"w=$w x=$x y=$y d=$d")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100000), prop)
    assert(res.passed, res.status.toString)
  }

  test("negative timestamps bucket correctly (true floor division)") {
    val df = Seq((1L, -100L), (2L, -40L), (3L, 10L), (4L, 500L))
      .toDF("id", "us")
    val joined = df.as("a").join(df.as("b"),
      col("a.id") < col("b.id") && abs(col("a.us") - col("b.us")) <= 60)
      .select(col("a.id"), col("b.id"))
    assertEquiPlan(joined)
    assert(joined.as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 3L)))
  }
}
