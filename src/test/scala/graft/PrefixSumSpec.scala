package graft

import graft.operators.{PrefixSum, Sampling}
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

  test("grouped property: per-group cumulative sum across partition counts") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 3000).map(i =>
      (s"g${i % 7}", i.toLong, rnd.nextInt(100).toLong))
    val shuffled = rnd.shuffle(rows)
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(_._2)
        .scanLeft((g, 0L, 0L)) { case ((_, _, acc), (_, k, v)) => (g, k, acc + v) }
        .tail.map { case (_, k, c) => (g, k) -> c }
    }
    // parts > group count on purpose: a group MUST span partitions
    for (parts <- Seq(1, 5, 16)) {
      val got = PrefixSum.runningTotalBy(
        shuffled.toDF("g", "k", "v"), "g", Seq("k"), "v", parts)
        .select("g", "k", "cum_v").as[(String, Long, Long)]
        .collect().map { case (g, k, c) => (g, k) -> c }.toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("grouped scan keeps a null group key as its own running total") {
    // null stratum is a legitimate group: rows must neither vanish at the
    // offsets join nor merge into a non-null group
    val df = Seq(
      (Option("a"), 1L, 10L), (None, 2L, 5L), (Option("a"), 3L, 20L),
      (None, 4L, 7L), (None, 5L, 1L)
    ).toDF("g", "k", "v")
    for (parts <- Seq(1, 4)) {
      val got = PrefixSum.runningTotalBy(df, "g", Seq("k"), "v", parts)
        .select("k", "cum_v").as[(Long, Long)].collect().toMap
      assert(got ==
        Map(1L -> 10L, 3L -> 30L, 2L -> 5L, 4L -> 12L, 5L -> 13L),
        s"parts=$parts")
    }
  }

  test("grouped scan descends by a negated order column deterministically") {
    // One group, order by -v: cum over v desc
    val df = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L))
      .toDF("g", "k", "v").withColumn("negv", -col("v"))
    val got = PrefixSum.runningTotalBy(df, "g", Seq("negv", "k"), "v", 4)
      .select("k", "cum_v").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 30L, 3L -> 50L, 1L -> 60L))
  }

  test("token budget select: inclusive greedy fill per stratum") {
    import graft.operators.Sampling
    val df = Seq(
      // src a: quality order d1(9) d2(8) d3(7); tokens 40, 50, 20
      ("a", 1L, 9L, 40L), ("a", 2L, 8L, 50L), ("a", 3L, 7L, 20L),
      // src b: one doc alone over budget
      ("b", 4L, 5L, 200L), ("b", 5L, 4L, 60L)
    ).toDF("source", "doc_id", "quality", "n_tokens")
    val got = Sampling.tokenBudgetSelect(df, "doc_id", "source",
      "quality", "n_tokens", 100L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    // a: d1 (40) + d2 (90) fit; d3 would be 110 -> out.
    // b: d4 is 200 > 100 -> out; d5 NEVER enters (inclusive cum counts
    // d4 first: 200, then d5 at 260) -> b selects nothing.
    assert(got == Map(1L -> 40L, 2L -> 90L))
  }

  test("shuffleOrder: dense permutation, partitioning-invariant, seed-decorrelated") {
    val df = (1L to 200L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val r = Sampling.shuffleOrder(df, "doc_id")
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect()
    assert(r.map(_._2).sorted.toSeq == (1L to 200L))   // dense 1..n
    val again = Sampling.shuffleOrder(df.repartition(7), "doc_id")
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect()
    assert(r.toSet == again.toSet)                     // layout-invariant
    val seeded = Sampling.shuffleOrder(df, "doc_id", seed = 1)
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect()
    assert(seeded.toSet != r.toSet)                    // fresh permutation
    // not the identity order (it actually shuffles)
    assert(r.toMap.toSeq.sortBy(_._1).map(_._2) != (1L to 200L))
  }

  test("densePositions equals row_number over the total order at any layout") {
    import graft.operators.PrefixSum
    // duplicate keys broken by id — the (key, id) combination is total
    val rows = (1L to 500L).map(i => (i, s"k${i % 37}"))
    val df = rows.toDF("id", "key")
    val expected = rows.sortBy { case (i, k) => (k, i) }
      .zipWithIndex.map { case ((i, _), p) => i -> (p + 1).toLong }.toMap
    for (parts <- Seq(1, 3, 32)) {
      val got = PrefixSum.densePositions(df.repartition(parts),
          Seq("key", "id"))
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got == expected, s"layout $parts diverged")
    }
    // positions are a dense 1..n permutation
    val ps = PrefixSum.densePositions(df, Seq("key", "id"))
      .select("pos").as[Long].collect().sorted.toSeq
    assert(ps == (1L to 500L))
    // empty input yields no rows, not an error
    assert(PrefixSum.densePositions(
      Seq.empty[(Long, String)].toDF("id", "key"), Seq("key", "id"))
      .count() == 0)
  }
}
