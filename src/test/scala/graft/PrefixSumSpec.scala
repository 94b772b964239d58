package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("property: equals the sequential cumulative sum across partition counts") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 2000).map(i => (i.toLong * 3 + 1, rnd.nextInt(100).toLong))
    val shuffled = rnd.shuffle(rows)
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (k, v)) => (k, v, acc + v) }
      .tail.map { case (k, _, c) => k -> c }.toMap
    for (parts <- Seq(1, 4, 13)) {
      val got = PrefixSum.runningTotal(
        shuffled.toDF("k", "v"), "k", "v", parts)
        .select("k", "cum_v").as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("no single-partition global window: the running sum stays parallel") {
    val df = PrefixSum.runningTotal(
      (1 to 100).map(i => (i.toLong, 1L)).toDF("k", "v"), "k", "v", 8)
    val plan = df.queryExecution.executedPlan.toString
    // the window is partitioned by __pid, never an empty PARTITION BY
    assert(plan.contains("__pid"), plan)
    assert(!plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\], \\[k.*"), plan)
  }

  test("empty input yields empty output") {
    val out = PrefixSum.runningTotal(
      Seq.empty[(Long, Long)].toDF("k", "v"), "k", "v", 4)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "v", "cum_v"))
  }
}
