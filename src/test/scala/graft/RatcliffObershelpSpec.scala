package graft

import graft.functions.RatcliffObershelp.{ratio, similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth values generated with CPython 3.11 difflib:
  * `SequenceMatcher(None, a, b).ratio() * 100`.
  */
class RatcliffObershelpSpec extends AnyFunSuite {

  private val eps = 1e-9

  private val groundTruth: Seq[(String, String, Double)] = Seq(
    ("apple", "appel", 80.0),
    ("abc", "abc", 100.0),
    ("", "", 100.0),
    ("a", "", 0.0),
    ("", "b", 0.0),
    ("Acme GmbH", "Acme GmbH.", 94.73684210526315),
    ("Acme GmbH", "ACME Gmbh", 55.55555555555556),
    ("Customer#000000001", "Customer#000000002", 94.44444444444444),
    ("Customer#000000001", "Customer#000001001", 94.44444444444444),
    ("Umbrella Corp", "Umbrela Corp", 96.0),
    ("DE89370400440532013000", "DE89370400440532013001", 95.45454545454545),
    ("abcdefgh", "hgfedcba", 12.5),
    ("xyzzy", "zzyxy", 60.0),
    ("aaaa", "aa", 66.66666666666666),
    ("ab" * 100, "ba" * 100, 0.0),                       // autojunk kills seeding
    ("ab" * 99 + "a", "ba" * 99 + "b", 99.49748743718592), // len 199: no autojunk
    ("x" * 200 + "y", "x" * 200 + "z", 99.50248756218906), // popular still extends
    ("x" * 199 + "y", "x" * 199 + "z", 99.5),
    ("the quick brown fox jumps over the lazy dog",
     "the quick brown fox jumped over a lazy dog", 91.76470588235294),
    // code-point semantics (Python str elements), incl. astral plane
    ("x😀y", "xy", 80.0),
    ("x😀y", "x😁y", 66.66666666666666),
    ("😀😁", "😁😀", 50.0),
    ("café", "cafe", 75.0),
  )

  test("matches CPython difflib ratio exactly") {
    groundTruth.foreach { case (a, b, expected) =>
      val got = similarity(a, b)
      assert(math.abs(got - expected) < eps,
        s"sim(${a.take(20)}, ${b.take(20)}) = $got, expected $expected")
    }
  }

  test("autojunk=false differs where autojunk matters") {
    assert(ratio("ab" * 100, "ba" * 100, autojunk = false) > 0.9)
  }

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map(_ => rnd.alphanumeric.take(rnd.nextInt(250)).mkString)
  }

  test("self-similarity is 100 (seeded property)") {
    randomStrings(200).foreach(s => assert(math.abs(similarity(s, s) - 100.0) < eps))
  }

  test("bounded in [0, 100] (seeded property)") {
    val ss = randomStrings(100)
    for (a <- ss.take(30); b <- ss.take(30)) {
      val s = similarity(a, b)
      assert(s >= 0.0 && s <= 100.0)
    }
  }
}

class SimilarityUdfSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  test("concat_key implements the reference's intended concatenation") {
    // solutionThree.py:19 used `+` (arithmetic -> null); the engine
    // implements the intent (concat), SURVEY §4 bug 1.
    val r = Seq(("Acme", "DE1")).toDF("name", "iban")
      .select(graft.functions.concat_key(col("name"), col("iban"))).collect()(0)
    assert(r.getString(0) == "AcmeDE1")
  }

  test("md5hash60 matches the DuckDB hex-cast formula") {
    // int(md5('abc')[:15], 16) and int(md5('7:abc')[:15], 16), CPython
    val r = Seq("abc").toDF("s").select(
      graft.functions.md5hash60(col("s"), 0),
      graft.functions.md5hash60(col("s"), 7)).collect()(0)
    assert(r.getLong(0) == 648541476951500027L)
    assert(r.getLong(1) == 754437124905479671L)
  }

  test("string_similarity column function and canonical_key") {
    val df = Seq(("apple", "appel"), ("Acme GmbH", "Acme GmbH."), (null, "x"))
      .toDF("a", "b")
    val rows = df.select(
      graft.functions.string_similarity(col("a"), col("b")).as("sim"),
      graft.functions.canonical_key(col("a"), col("b")).as("key"))
      .collect()
    assert(math.abs(rows(0).getDouble(0) - 80.0) < 1e-9 && rows(0).getString(1) == "appel")
    assert(math.abs(rows(1).getDouble(0) - 94.73684210526315) < 1e-9)
    assert(rows(1).getString(1) == "Acme GmbH")
    assert(rows(2).isNullAt(0))
  }
}
