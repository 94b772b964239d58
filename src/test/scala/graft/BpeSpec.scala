package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions.expr

/** Hand-computed BPE fixtures: merge order, weighted pair counts, the
  * x == y run semantics (every-other-start), and encode round-trips.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns merges in weighted frequency order with ties broken lexically") {
    // words: "aaab" f=2, "ab" f=1.
    // round 1: (a,a) = 2 positions x f2 = 4 beats (a,b) = 2 + 1 = 3.
    // round 2: after aaab -> [aa, a, b]: (a,b) = 2+1=3 beats (aa,a) = 2.
    // round 3: aaab -> [aa, ab], ab -> [ab]: (aa, ab) = 2.
    val docs = Seq((1L, "aaab ab aaab")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 3)
      .orderBy("merge_rank")
      .select("merge_rank", "x", "y", "pair_count")
      .as[(Long, String, String, Long)].collect()
    assert(got === Array(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
  }

  test("x == y runs merge every other start (left-to-right non-overlap)") {
    // "aaaa": (a,a) appears at 3 positions -> count 3; merging yields
    // [aa, aa], then (aa, aa) -> count 1 -> "aaaa" as one symbol.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 3)
      .orderBy("merge_rank")
      .select("merge_rank", "x", "y", "pair_count")
      .as[(Long, String, String, Long)].collect()
    assert(got === Array((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
    // only 2 merges possible -> early stop, 2 rows not 3
  }

  test("encode applies the merge list and counts subwords per doc") {
    val docs = Seq((1L, "aaab ab"), (2L, "zz")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"))
    // doc1: aaab -> [aa, ab] (2), ab -> [ab] (1) => 2 words, 3 subwords
    // doc2: zz -> [z, z] untouched => 1 word, 2 subwords
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 2L, 3L), (2L, 1L, 2L)))
    // no merges = character count
    val raw = Bpe.encode(docs, "doc_id", "text", Nil)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(raw === Array((1L, 2L, 6L), (2L, 1L, 2L)))
  }

  test("empty corpus and single-char vocab stop cleanly") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(empty, "text", 3).count() == 0)
    val single = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(Bpe.train(single, "text", 3).count() == 0) // no adjacent pairs
    assert(Bpe.encode(empty, "doc_id", "text", Seq(("a", "b"))).count() == 0)
  }

  test("batched training: M>1 equals M=1 when the chosen pairs are disjoint") {
    // top pairs per pass are symbol-disjoint by construction: four
    // unrelated frequent bigrams with distinct characters and strictly
    // ordered counts — sequential and batched training pick the same
    // merges in the same order with the same counts.
    val docs = Seq((1L, ("ab " * 9) + ("cd " * 7) + ("ef " * 5) + ("gh " * 3)))
      .toDF("doc_id", "text")
    val seqTable = Bpe.train(docs, "text", 4).orderBy("merge_rank")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    // sequential output self-identifies: pass_id == merge_rank
    assert(seqTable.map(_._5) == seqTable.map(_._1))
    val seqRes = seqTable.map(t => (t._1, t._2, t._3, t._4))
    for (m <- Seq(2, 4)) {
      val batTable = Bpe.train(docs, "text", 4, batchM = m)
        .orderBy("merge_rank")
        .as[(Long, String, String, Long, Long)].collect().toSeq
      assert(batTable.map(t => (t._1, t._2, t._3, t._4)) == seqRes, s"batchM=$m")
      // batched output self-identifies: pass_id groups ceil(rank/M)
      assert(batTable.map(_._5) == seqTable.map(t => (t._1 - 1) / m + 1),
        s"batchM=$m pass ids")
    }
    assert(seqRes.map(t => (t._2, t._3)) ==
      Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
  }

  test("batched training skips conflicting candidates within a pass") {
    // "aaab ab aaab" (the rank-order fixture): round-1 winner (a,a)
    // uses both symbols of runner-up (a,b), so a batched pass must NOT
    // take (a,b) at its stale pre-merge count — it defers to the next
    // pass, reproducing the sequential merge list exactly here because
    // every later winner depends on the earlier merge's output symbols.
    val docs = Seq((1L, "aaab ab aaab")).toDF("doc_id", "text")
    def table(batchM: Int) = Bpe.train(docs, "text", 3, batchM = batchM)
      .orderBy("merge_rank")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val seqRes = table(1)
    val bat = table(3)
    assert(bat.map(t => (t._1, t._2, t._3, t._4)) ==
      seqRes.map(t => (t._1, t._2, t._3, t._4)))
    // every pass deferred the conflicting runner-up: one merge per pass
    assert(bat.map(_._5) == Seq(1L, 2L, 3L))
  }

  test("train is deterministic across repartitioned input") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.train(docs, "text", 4)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    val b = Bpe.train(docs.repartition(7), "text", 4)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    assert(a === b)
    assert(a.length == 4)
  }

  test("fold merge equals the oracle's positional replay (exhaustive, len <= 10)") {
    // The DuckDB oracle replays merges POSITIONALLY: match starts grouped
    // into consecutive runs, every other start active. The engine uses a
    // left fold. Exhaustively check equivalence over every {a,b} string
    // up to length 10 for the three structurally distinct pairs.
    def positional(s: Vector[String], x: String, y: String): Vector[String] = {
      val hits = (0 until s.length - 1).filter(j => s(j) == x && s(j + 1) == y)
      val active = scala.collection.mutable.Set.empty[Int]
      var run = List.empty[Int]
      def flush(): Unit = {
        run.reverse.zipWithIndex.foreach { case (j, i) =>
          if (i % 2 == 0) active += j
        }
        run = Nil
      }
      hits.foreach { j =>
        if (run.nonEmpty && run.head != j - 1) flush()
        run = j :: run
      }
      flush()
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (active(j)) { out += (x + y); j += 2 }
        else { out += s(j); j += 1 }
      }
      out.result()
    }
    val words = (1 to 10).flatMap { n =>
      (0 until (1 << n)).map { bits =>
        (0 until n).map(i => if ((bits >> i & 1) == 1) "b" else "a").mkString
      }
    }
    val df = words.toDF("word")
      .withColumn("s", expr(graft.operators.Bpe.CharSplit))
    for ((x, y) <- Seq(("a", "a"), ("a", "b"), ("b", "a"))) {
      val got = df.withColumn("m",
          expr(graft.operators.Bpe.mergeExpr("s", x, y)))
        .select("word", "m").as[(String, Seq[String])].collect().toMap
      words.foreach { w =>
        val ref = positional(w.map(_.toString).toVector, x, y)
        assert(got(w) == ref, s"word=$w pair=($x,$y): ${got(w)} vs $ref")
      }
    }
  }

  test("merge literals survive quotes and backslashes in tokens") {
    val docs = Seq((1L, "a'b a'b x\\y x\\y")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 2)
      .orderBy("merge_rank")
      .select("merge_rank", "x", "y", "pair_count")
      .as[(Long, String, String, Long)].collect()
    assert(got.length == 2)
    // both words contribute pairs; encoding with the learned merges must
    // not throw and must shrink the subword count
    val merges = got.map(r => (r._2, r._3)).toSeq
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
    assert(enc.head._2 == 4L && enc.head._3 < 12L)
  }
}
