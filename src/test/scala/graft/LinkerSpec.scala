package graft

import graft.operators.Linker

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

  test("windowCollect collapses to one row per partition key") {
    val pairs = Seq(("k1", "b"), ("k1", "a"), ("k1", "a"), ("k2", "z"))
      .toDF("uniqId", "name_a")
    val out = Linker.windowCollect(pairs, "uniqId", Seq("name_a" -> "CollectedNames"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("k1" -> "a,b", "k2" -> "z"))
  }
}
