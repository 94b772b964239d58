package graft

import graft.functions.MinK
import org.apache.spark.sql.functions._

class MinKSpec extends SparkSpec {
  import spark.implicits._

  test("min_k returns the k smallest per group, sorted; small groups whole") {
    val df = Seq(
      ("a", 5L), ("a", 1L), ("a", 9L), ("a", 3L), ("a", 1L),
      ("b", 7L),
      ("c", 2L), ("c", 2L)
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(MinK.min_k(col("v"), 3).as("mins"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == Seq(1L, 1L, 3L))   // duplicates kept
    assert(got("b") == Seq(7L))
    assert(got("c") == Seq(2L, 2L))
  }

  test("property: min_k equals sorted.take(k) under random data and partitioning") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 5000).map(_ => (s"g${rnd.nextInt(20)}", rnd.nextLong() % 1000))
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(4).toSeq).toMap
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(MinK.min_k(col("v"), 4).as("mins"))
        .as[(String, Seq[Long])].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("the plan partial-aggregates before the exchange (O(k) per group shuffles)") {
    val df = Seq(("a", 1L)).toDF("g", "v")
      .groupBy("g").agg(MinK.min_k(col("v"), 3))
    val plan = df.queryExecution.executedPlan.toString
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_")
    assert(exchangeIdx >= 0 && partialIdx >= 0, plan)
    // physical plans print top-down: the partial aggregate appears BELOW
    // (after) the exchange in the text iff it runs before it
    assert(partialIdx > exchangeIdx, plan)
  }
}
