package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Events: (key, id, epoch seconds). Window of 60s.
  private lazy val events = Seq(
    ("u1", 1L, 0L), ("u1", 2L, 30L), ("u1", 3L, 59L),  // 1-2, 2-3, 1-3 (gap 59)
    ("u1", 4L, 200L),                                   // alone
    ("u2", 5L, 0L), ("u2", 6L, 61L),                    // gap 61 > 60: no pair
    ("u2", 7L, 119L),                                   // 6-7 (gap 58, adjacent buckets)
    ("u3", 8L, 1000L)                                   // singleton key
  ).toDF("user", "id", "sec")
    .withColumn("ts", timestamp_seconds(col("sec")))

  private def pairs = RangeJoin.timeRangePairs(events, "user", "id", "ts", 60)

  test("exactly the within-window same-key pairs, each once, ordered id_a < id_b") {
    val got = pairs.select("id_a", "id_b", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, 2L) -> 30000000L, (2L, 3L) -> 29000000L, (1L, 3L) -> 59000000L,
      (6L, 7L) -> 58000000L))
  }

  test("matches the naive theta-join on random data (bucketing is exact)") {
    val n = 500
    val rnd = new scala.util.Random(7)
    val df = (0 until n).map { i =>
      (s"u${rnd.nextInt(8)}", i.toLong, rnd.nextInt(3600).toLong)
    }.toDF("user", "id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val fast = RangeJoin.timeRangePairs(df, "user", "id", "ts", 45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = df.as("a").join(df.as("b"),
        col("a.user") === col("b.user") && col("a.id") < col("b.id") &&
          abs(col("a.sec") - col("b.sec")) <= 45)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(fast == naive)
  }

  test("plans as an equi shuffle join, not a nested-loop cartesian") {
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
