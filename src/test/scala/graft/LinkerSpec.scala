package graft

import graft.operators.Linker
import org.apache.spark.sql.functions.col

class LinkerSpec extends SparkSpec {
  import spark.implicits._

  // Counterparty-shaped fixture (FIXTURES.md §A): exact dupes, near-dupes
  // straddling the 80 threshold, empty-iban rows.
  private lazy val cp = Seq(
    ("Acme GmbH", "DE89370400440532013000"),
    ("Acme GmbH", "DE89370400440532013000"),   // exact dup -> dedup'd
    ("Acme GmbH.", "DE89370400440532013001"),  // sim(name)=94.7 -> linked
    ("ACME Gmbh", "FR7630006000011234567890"), // sim=55.6 -> not linked by name
    ("Umbrella Corp", "GB29NWBK60161331926819"),
    ("Umbrela Corp", ""),                      // empty alt -> excluded by guard
    ("Zzyzx Ltd", "IT60X0542811101000000123456")
  ).toDF("name", "iban")

  test("similarityPairs applies F1/F2/F3 guards like the reference") {
    val pairs = Linker.similarityPairs(
      graft.operators.Dedup.exact(cp, Seq("name", "iban")), "name", Some("iban"), 80.0)
    val got = pairs.select("name_a", "name_b").as[(String, String)].collect().toSet
    // Acme GmbH ~ Acme GmbH. both directions; Umbrela Corp excluded (empty iban)
    assert(got == Set(("Acme GmbH", "Acme GmbH."), ("Acme GmbH.", "Acme GmbH")))
  }

  test("pipeline produces one deterministic row per cluster") {
    val out = Linker.pipeline(cp, "name", Some("iban"), 80.0)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("uniqId") == "Acme GmbH")
    assert(r.getAs[String]("CollectedNames") == "Acme GmbH,Acme GmbH.")
  }

  test("pipeline without alt column links on name similarity alone") {
    val df = Seq("Acme GmbH", "Acme GmbH.", "Umbrella Corp", "Umbrela Corp")
      .toDF("name")
    val out = Linker.pipeline(df, "name", None, 80.0).collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("Acme GmbH") == "Acme GmbH,Acme GmbH.")
    assert(byId("Umbrela Corp") == "Umbrela Corp,Umbrella Corp")
  }

  // q_link_ro's oracle: Ratcliff/Obershelp is not expressible in DuckDB SQL
  // (no gestalt-similarity function; the recursive longest-matching-block
  // algorithm has no SQL form), so the driver's harness records a rows-only
  // check. THIS test is the oracle instead: the full distributed pipeline
  // against an independent driver-side O(n²) reimplementation over the real
  // sf0.01 supplier table — the similarity scalar itself is separately
  // pinned to CPython difflib in RatcliffObershelpSpec.
  test("q_link_ro pipeline matches a brute-force driver-side oracle on supplier sf0.01") {
    val supplier = Tables.supplier(spark, "/root/testdata/sf0.01")
    val got = Linker.pipeline(supplier, "s_name", None, 80.0)
      .as[(String, String)].collect().toMap
    val names = supplier.select("s_name").distinct().as[String].collect()
    val expected = (for {
      a <- names; b <- names
      if a != b && graft.functions.RatcliffObershelp.similarity(a, b) >= 80.0
    } yield (if (a <= b) a else b, a))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).distinct.sorted.mkString(",") }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  // Parity pin for SURVEY §7.2's blocked mode: the prefix-filter equi-join
  // must reproduce the faithful BNLJ's pair set EXACTLY — first on the real
  // supplier fixture (dense near-identical names: the filter's worst
  // territory), then on a varied-length frame that exercises the length
  // band's boundary (a 9-vs-14-char pair sits outside lb·120 >= 80·la and
  // must be pruned WITHOUT being a lost true pair; difflib agrees it is
  // below 80).
  test("similarityPairsBlocked == similarityPairs on supplier sf0.001 and a banded frame") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("uniqId", "name_a", "name_b")
        .as[(String, String, String)].collect().toSet
    val supplier = spark.read.parquet(s"$sf0001/supplier.parquet")
    val dedup = graft.operators.Dedup.exact(supplier, Seq("s_name"))
    val naive = pairSet(Linker.similarityPairs(dedup, "s_name", None, 80.0)
      .select("uniqId", "name_a", "name_b"))
    val blocked = pairSet(Linker.similarityPairsBlocked(dedup, "s_name", 80.0))
    assert(blocked == naive)
    assert(naive.nonEmpty, "fixture must actually link something")

    // The last two rows are a measured ASYMMETRIC boundary pair —
    // difflib gives 80.0 one way and 74.3 the other — so this frame
    // regression-pins the per-direction verify (a one-per-unordered-pair
    // verify emits or drops both orientations together and diverges).
    val varied = Seq("Acme GmbH", "Acme GmbH.", "Acme GmbH Int.", "Umbrella Corp",
      "Umbrela Corp", "corp Umbrella", "Zzyzx", "Zzyzx Ltd", "x",
      "kilo mike bravo 6", "kilo ember bravo 2").toDF("name")
    val n2 = pairSet(Linker.similarityPairs(varied, "name", None, 80.0)
      .select("uniqId", "name_a", "name_b"))
    val b2 = pairSet(Linker.similarityPairsBlocked(varied, "name", 80.0))
    assert(b2 == n2)
    // and the blocking genuinely prunes on a diverse corpus: disjoint-char
    // names ("Zzyzx" vs "Acme GmbH") never become candidates
    val cand = Linker.roBlockCandidates(varied, "name", 80.0).count()
    assert(cand < 11L * 10 / 2, s"prefix filter pruned nothing: $cand of 55")
  }

  // Property-style exactness pin across thresholds: the blocking math
  // (integer length band, prefix size, banded-lev count filter) must
  // never drop a true pair at ANY integral threshold — exercised on a
  // seeded random corpus dense in boundary pairs (bases + 1- and 2-edit
  // mutants over a 6-char alphabet, lengths 3..22, so collisions,
  // shared multisets, and near-threshold sims all occur).
  test("similarityPairsBlocked == similarityPairs at thresholds 60/75/90 on a seeded random corpus") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("uniqId", "name_a", "name_b")
        .as[(String, String, String)].collect().toSet
    val rng = new scala.util.Random(42)
    val alpha = "abcdef"
    def word(n: Int): String =
      (1 to n).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    def mutate(s: String): String = {
      val i = rng.nextInt(s.length max 1)
      rng.nextInt(3) match {
        case 0 => s.updated(i min (s.length - 1), alpha(rng.nextInt(alpha.length)))
        case 1 if s.length > 1 => s.take(i) + s.drop(i + 1)
        case _ => s.take(i) + alpha(rng.nextInt(alpha.length)) + s.drop(i)
      }
    }
    val bases = (1 to 30).map(_ => word(3 + rng.nextInt(20)))
    val names = (bases ++ bases.map(mutate) ++ bases.map(b => mutate(mutate(b))))
      .distinct
    val df = names.toDF("name")
    for (t <- Seq(60.0, 75.0, 90.0)) {
      val naive = pairSet(Linker.similarityPairs(df, "name", None, t)
        .select("uniqId", "name_a", "name_b"))
      val blocked = pairSet(Linker.similarityPairsBlocked(df, "name", t))
      assert(blocked == naive, s"threshold $t")
    }
  }

  test("similarityPairsAuto picks the measured branch and is result-identical on all of them") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("uniqId", "name_a", "name_b")
        .as[(String, String, String)].collect().toSet
    def usesBnlj(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    val varied = Seq("Acme GmbH", "Acme GmbH.", "Acme GmbH Int.", "Umbrella Corp",
      "Umbrela Corp", "corp Umbrella", "Zzyzx", "Zzyzx Ltd", "x",
      "kilo mike bravo 6", "kilo ember bravo 2").toDF("name")
    // t=80, tiny corpus -> the measured single-node winner: the BNLJ
    val auto80 = Linker.similarityPairsAuto(varied, "name", 80.0)
    assert(usesBnlj(auto80), "below the crossover on a small corpus auto must take the BNLJ")
    assert(pairSet(auto80) ==
      pairSet(Linker.similarityPairsBlocked(varied, "name", 80.0)))
    // t=90 (the crossover) -> blocked regardless of size
    val auto90 = Linker.similarityPairsAuto(varied, "name", 90.0)
    assert(!usesBnlj(auto90), "at/above the crossover auto must take the blocked form")
    assert(pairSet(auto90) ==
      pairSet(Linker.similarityPairs(varied, "name", None, 90.0)
        .select("uniqId", "name_a", "name_b")))
    // t=80 past the single-node name budget -> blocked (the only shape
    // that distributes; the budget models the BNLJ's broadcast wall)
    val autoBig = Linker.similarityPairsAuto(varied, "name", 80.0, maxBnljNames = 5)
    assert(!usesBnlj(autoBig), "past the name budget auto must take the blocked form")
    assert(pairSet(autoBig) == pairSet(auto80))
    // duplicate input rows must not duplicate pairs (auto distincts names)
    val dup = varied.unionByName(varied)
    assert(pairSet(Linker.similarityPairsAuto(dup, "name", 80.0)) == pairSet(auto80))
    // NON-INTEGRAL thresholds: the BNLJ computes them exactly, so under
    // the broadcast wall auto must route there — even at/above the
    // blocked crossover, where only the integral path may take blocked
    val autoFrac = Linker.similarityPairsAuto(varied, "name", 90.5)
    assert(usesBnlj(autoFrac),
      "non-integral threshold under the wall must take the BNLJ")
    assert(pairSet(autoFrac) ==
      pairSet(Linker.similarityPairs(varied, "name", None, 90.5)
        .select("uniqId", "name_a", "name_b")))
    // ... and only the truly infeasible combination (non-integral AND
    // past the wall) is rejected, up front with both numbers named
    val eF = intercept[IllegalArgumentException] {
      Linker.similarityPairsAuto(varied, "name", 80.5, maxBnljNames = 5)
    }
    assert(eF.getMessage.contains("80.5") &&
      eF.getMessage.contains("maxBnljNames=5"), eF.getMessage)
  }

  test("similarityPairsBlocked rejects non-integral thresholds and handles empty input") {
    intercept[IllegalArgumentException] {
      Linker.similarityPairsBlocked(Seq("a").toDF("name"), "name", 80.5)
    }
    val empty = Linker.similarityPairsBlocked(
      Seq.empty[String].toDF("name"), "name", 80.0)
    assert(empty.count() == 0)
  }

  test("windowCollect collapses to one row per partition key") {
    val pairs = Seq(("k1", "b"), ("k1", "a"), ("k1", "a"), ("k2", "z"))
      .toDF("uniqId", "name_a")
    val out = Linker.windowCollect(pairs, "uniqId", Seq("name_a" -> "CollectedNames"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("k1" -> "a,b", "k2" -> "z"))
  }

  test("sortedNeighborhood matches the single-node replay on suppliers") {
    val supplier = spark.read.parquet(s"$sf0001/supplier.parquet")
    val w = 5
    val got = Linker.sortedNeighborhood(supplier, "s_suppkey", "s_name", w, 2)
      .select("id_a", "id_b", "dist", "gap")
      .as[(Long, Long, Long, Long)].collect().toSet
    // replay: sort by (name, id), pair within w positions, lev <= 2
    val rows = supplier.select(col("s_suppkey"), col("s_name"))
      .as[(Long, String)].collect().sortBy(r => (r._2, r._1))
    val expected = (for {
      i <- rows.indices
      j <- (i + 1) to math.min(i + w, rows.length - 1)
      d = levDist(rows(i)._2, rows(j)._2)
      if d <= 2
    } yield (rows(i)._1, rows(j)._1, d.toLong, (j - i).toLong)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // every gap honors the window and positions pair each (a, b) once
    assert(got.forall(p => p._4 >= 1 && p._4 <= w))
    assert(got.size == got.map(p => (p._1, p._2)).size)
  }

  test("sortedNeighborhoodRecall: perfect when dups sort together, partial on prefix typos") {
    // exact-duplicate keys are sort-adjacent -> every true pair inside
    // the window -> recall exactly 1
    val adjacent = Seq((1L, "acme corp"), (2L, "acme corp"), (3L, "zzz ltd"))
      .toDF("id", "key")
    val full = Linker.sortedNeighborhoodRecall(adjacent, "id", "key", 3, 2)
      .as[(Long, Long, Double)].head()
    assert(full == ((1L, 1L, 1.0)))
    // a FIRST-character typo sorts far away: with enough rows between,
    // the window misses it — the recall limitation the audit exists for
    val spread = (Seq((1L, "aaaa"), (100L, "baaa")) ++
      (2L to 40L).map(i => (i, f"m$i%038d"))).toDF("id", "key")
    val r = Linker.sortedNeighborhoodRecall(spread, "id", "key", 3, 2)
      .as[(Long, Long, Double)].head()
    assert(r._1 >= 1L && r._2 < r._1, r) // the aaaa~baaa pair is missed
  }

  test("sortedNeighborhoodMulti: reversed pass catches the first-char typo, union beats single passes") {
    import org.apache.spark.sql.functions.{col, reverse}
    // aaaa ~ zaaa (dist 1) sort 39 rows apart FORWARD (every m-key sits
    // between) but adjacent REVERSED (m-keys reversed start with a
    // digit, sorting before both) — the canonical Hernández–Stolfo
    // multi-pass case.
    val spread = (Seq((1L, "aaaa"), (100L, "zaaa")) ++
      (2L to 40L).map(i => (i, f"m$i%038d"))).toDF("id", "key")
    val passes = Seq("forward" -> col("key"), "reversed" -> reverse(col("key")))
    val audit = Linker.sortedNeighborhoodMultiRecall(spread, "id", "key",
        passes, 3, 2)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(audit.keySet == Set("forward", "reversed", "union"))
    // union strictly beats forward (it adds at least the typo pair) and
    // is never below any single pass
    assert(audit("union")._3 > audit("forward")._3, audit)
    assert(audit("union")._3 >= audit("reversed")._3, audit)
    // the typo pair itself: dist 1, caught by exactly one pass
    val pairs = Linker.sortedNeighborhoodMulti(spread, "id", "key",
        passes.map(_._2), 3, 2)
      .as[(Long, String, Long, String, Long, Long)].collect()
    val typo = pairs.find(t => t._1 == 1L && t._3 == 100L)
    assert(typo.nonEmpty, pairs.mkString(", "))
    assert(typo.get._5 == 1L && typo.get._6 == 1L, typo)
    // single-pass multi with the identity key reproduces plain SNM's
    // pair set (normalized)
    val single = Linker.sortedNeighborhoodMulti(spread, "id", "key",
        Seq(col("key")), 3, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plain = Linker.sortedNeighborhood(spread, "id", "key", 3, 2)
      .selectExpr("least(id_a, id_b)", "greatest(id_a, id_b)")
      .as[(Long, Long)].collect().toSet
    assert(single == plain)
  }

  test("sortedNeighborhoodTcRecall: closure recovers chained misses, billed as precision") {
    import org.apache.spark.sql.functions.col
    // an edit chain aaaa~aaab~aabb~abbb, window 1: SNM catches only the
    // sort-adjacent links; closure merges the chain into one component.
    //   truth (lev<=2): (1,2)(1,3)(2,3)(2,4)(3,4) — 5 pairs ((1,4) is 3)
    //   union (w=1):    (1,2)(2,3)(3,4)           — recall 3/5, prec 1
    //   tc:             all 6 component pairs     — recall 1, prec 5/6
    val chain = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aabb"), (4L, "abbb"))
      .toDF("id", "key")
    val rows = Linker.sortedNeighborhoodTcRecall(chain, "id", "key",
        Seq(col("key")), 1, 2)
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("union", "tc"))
    assert(rows("union") == (("union", 5L, 3L, 3L, 0.6, 1.0)), rows("union"))
    assert(rows("tc") == (("tc", 5L, 6L, 5L, 1.0, 5.0 / 6.0)), rows("tc"))
  }

  test("sortedNeighborhood: null keys drop, empty input is empty") {
    val df = Seq((1L, "abc"), (2L, null.asInstanceOf[String]), (3L, "abd"))
      .toDF("id", "key")
    val got = Linker.sortedNeighborhood(df, "id", "key", 3, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
    val empty = Seq.empty[(Long, String)].toDF("id", "key")
    assert(Linker.sortedNeighborhood(empty, "id", "key", 3, 2).count() == 0)
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
