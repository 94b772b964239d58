package graft

import graft.operators.{PageRank, Winnow}
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def star: org.apache.spark.sql.DataFrame =
    // hub 1 connected to 2,3,4; isolated pair 5-6
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("id_a", "id_b")

  test("symmetrize emits both directions of every pair") {
    val e = PageRank.symmetrize(star, "id_a", "id_b")
    assert(e.count() == 8)
    assert(e.filter(col("src") === 2L && col("dst") === 1L).count() == 1)
  }

  test("rank mass is conserved up to floor leakage; hub outranks leaves") {
    val e = PageRank.symmetrize(star, "id_a", "id_b")
    val r = PageRank.ranks(e, "src", "dst", 3).as[(Long, Long, Long)]
      .collect().toSeq
    assert(r.size == 6)
    val mass = r.map(_._3).sum
    // floor() loses at most 1 unit per (edge + base) per iteration
    assert(mass <= PageRank.Scale && mass > PageRank.Scale - 1000L)
    val byId = r.map(t => t._1 -> t._3).toMap
    assert(byId(1L) > byId(2L), s"hub must outrank a leaf: $byId")
    // symmetric leaves tie exactly (integer arithmetic, no FP noise)
    assert(byId(2L) == byId(3L) && byId(3L) == byId(4L))
    assert(byId(5L) == byId(6L))
  }

  test("zero iterations returns the uniform start vector") {
    val e = PageRank.symmetrize(star, "id_a", "id_b")
    val r = PageRank.ranks(e, "src", "dst", 0)
      .select("r").as[Long].collect().toSet
    assert(r == Set(PageRank.Scale / 6))
  }

  test("deterministic under different partitioning (integer arithmetic)") {
    val pairs = Winnow.sharedFingerprintPairs(
      Tables.documents(spark, sf0001), "doc_id", "text", 2)
    val e = PageRank.symmetrize(pairs, "id_a", "id_b")
    val a = PageRank.ranks(e, "src", "dst", 3)
      .as[(Long, Long, Long)].collect().toSet
    val b = PageRank.ranks(e.repartition(13), "src", "dst", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("weighted ranks: scale-invariant in the weights; heavy edges pull harder") {
    // path A-B (weight 10) and B-C (weight 1): B sends 10/11 of its mass
    // to A — A must outrank C (unweighted would tie them)
    val wpairs = Seq((1L, 2L, 10L), (2L, 3L, 1L)).toDF("id_a", "id_b", "w")
    val e = PageRank.symmetrize(wpairs, "id_a", "id_b")
    val r = PageRank.ranksWeighted(e, "src", "dst", "w", 3)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(r(1L) > r(3L), s"heavy edge must pull: $r")
    val unw = PageRank.ranks(e.drop("w"), "src", "dst", 3)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(unw(1L) == unw(3L), s"unweighted path ends tie: $unw")
    // multiplying every weight by a constant changes nothing: the
    // contribution is floor of the same rational number
    val r3 = PageRank.ranksWeighted(
      e.withColumn("w", col("w") * 3), "src", "dst", "w", 3)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(r3 == r)
  }

  test("matches an in-memory integer reference on random weighted graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 3 + rnd.nextInt(8)
      val pairs = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextBoolean()
      } yield (i.toLong, j.toLong, 1L + rnd.nextInt(5))).toSeq
      if (pairs.nonEmpty) {
        val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        val nodes = wdeg.keys.toSeq.sorted
        var ref = nodes.map(_ -> PageRank.Scale / nodes.size).toMap
        val base = (3L * PageRank.Scale / 20L) / nodes.size
        val inEdges = edges.groupBy(_._2)
        for (_ <- 1 to 3) {
          val prev = ref
          ref = nodes.map { v =>
            v -> (base + inEdges(v).map { case (u, _, w) =>
              (17L * prev(u) * w) / (20L * wdeg(u))
            }.sum)
          }.toMap
        }
        val got = PageRank.ranksWeighted(
          edges.toDF("src", "dst", "w"), "src", "dst", "w", 3)
          .select("id", "r").as[(Long, Long)].collect().toMap
        assert(got == ref, s"trial $trial pairs=$pairs")
      }
    }
  }

  test("personalized ranks: mass stays near the seeds; disconnected nodes get zero") {
    // two components: 1-2-3 chain and 4-5 pair; seed = {1}
    val pairs = Seq((1L, 2L, 1L), (2L, 3L, 1L), (4L, 5L, 1L))
      .toDF("id_a", "id_b", "w")
    val e = PageRank.symmetrize(pairs, "id_a", "id_b")
    val r = PageRank.ranksPersonalized(e, "src", "dst", "w", Seq(1L), 4)
      .select("id", "r").as[(Long, Long)].collect().toMap
    // the seed's component holds all mass; the other component none
    assert(r(4L) == 0L && r(5L) == 0L, r.toString)
    // the seed dominates; NO claim on r(2) vs r(3) — a path graph is
    // near-bipartite and mass oscillates between odd/even hop distances
    // per iteration (classic power-iteration periodicity)
    assert(r(1L) > r(2L) && r(1L) > r(3L) && r(2L) > 0L && r(3L) > 0L,
      s"seed must dominate its component: $r")
    // uniform-seed degenerate case: seeding EVERY node reproduces ranks()
    val all = PageRank.ranksPersonalized(e, "src", "dst", "w",
      Seq(1L, 2L, 3L, 4L, 5L), 3)
      .select("id", "r").as[(Long, Long)].collect().toMap
    val unif = PageRank.ranksWeighted(e, "src", "dst", "w", 3)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(all == unif)
  }

  test("empty graph yields an empty result, not an error") {
    val e = PageRank.symmetrize(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
    assert(PageRank.ranks(e, "src", "dst", 3).count() == 0)
  }

  test("top-ranked node of a dup cluster has max degree in a clique") {
    // 4-clique 1..4 plus pendant 9 attached to 1: node 1 has highest degree
    val clique = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val e = PageRank.symmetrize(
      (clique :+ (1L, 9L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val top = PageRank.ranks(e, "src", "dst", 5)
      .orderBy(col("r").desc, col("id")).select("id").as[Long].head()
    assert(top == 1L)
  }
}
