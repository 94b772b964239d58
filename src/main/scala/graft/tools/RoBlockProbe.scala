package graft.tools

import graft.{GraftLocalDir, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the blocked RO join (dev scratch), arg-gated sections
  * (`supplier`, `diverse`, `long`, `random`, `random16`, `wall`,
  * `wall32`; no args = all but wall32):
  *
  *  1. filter effectiveness on the supplier fixture: candidate pairs
  *     surviving prefix filter + length band vs all pairs vs verified —
  *     the numbers quoted in Linker.similarityPairsBlocked's Scaladoc
  *     (SPARK_GRAFT_SF_DIR selects the fixture, default sf0.01);
  *
  *  2. the trade vs the faithful BNLJ on a DIVERSE corpus (deterministic
  *     three-word names from a 40-word vocabulary, most pairs below the
  *     threshold) at n = 2000/4000/8000: wall time of both strategies +
  *     equality of pair counts;
  *
  *  3. the same sweep on LONG 8-word keys (~55 chars), where the difflib
  *     verify per pair is several times dearer.
  *
  * Round-12 results (README crossover table): at the fixture threshold
  * t=80 the BNLJ won every cell — diverse 0.33x/0.35x/0.18x, long
  * 0.24x/0.30x, random-letters 0.29x/0.15x (blocked/BNLJ speedup) —
  * because the exactness-preserving prefix is ~l/3 elements at t=80 and
  * even uniform-random 22-char names share a rare tagged char ~80% of
  * the time; the codegen difflib verify costs ~0.5-2 us/pair vs
  * ~2-3 us to push one candidate row through the prefix join +
  * distinct. The crossover is IN THE THRESHOLD (prefix = 4 elements at
  * t=90, 2 at t=95): random-letters at t=90 0.60x, at t=95 **1.12x at
  * n=4000 and 1.95x at n=16000, growing** — blocked tracks pruned
  * candidates, the BNLJ tracks n² regardless. Below the crossover the
  * blocked form's justification is SHAPE (bounded equi-joins that
  * distribute; the BNLJ broadcasts one side in full and dies at corpus
  * scale); at near-dup thresholds it wins outright.
  */
object RoBlockProbe {
  def main(args: Array[String]): Unit = {
    val only = args.toSet
    def section(name: String): Boolean = only.isEmpty || only(name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", GraftLocalDir.path)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Linker}

    if (section("supplier")) {
      val dedup = Dedup.exact(Tables.supplier(spark, sfDir), Seq("s_name"))
      val n = dedup.select(countDistinct(col("s_name"))).head.getLong(0)
      val cand = Linker.roBlockCandidates(dedup, "s_name", 80.0).count()
      val verified = Linker.similarityPairsBlocked(dedup, "s_name", 80.0).count() / 2
      val all = n * (n - 1) / 2
      println(f"[roblock] supplier: n=$n allPairs=$all candidates=$cand " +
        f"(${100.0 * cand / all}%.1f%%) verified=$verified")
    }

    // Diverse corpus: three pseudo-words per name, deterministic in id.
    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
      "victor", "whiskey", "xray", "yankee", "zulu", "amber", "birch",
      "cedar", "dune", "ember", "fjord", "grove", "harbor", "isle",
      "juniper", "knoll", "lagoon", "mesa", "nimbus")
    val vcol = array(vocab.map(lit): _*)
    def diverse(n: Long) = spark.range(n).select(
      concat_ws(" ",
        element_at(vcol, (col("id") % 40 + 1).cast("int")),
        element_at(vcol, (col("id") / 7 % 40 + 1).cast("int")),
        element_at(vcol, (col("id") / 191 % 40 + 1).cast("int")),
        (col("id") % 13).cast("string")).as("name"))
    def time(label: String)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[roblock] $label%-24s $s%6.2f s  pairs=$r")
      (s, r)
    }
    // Size sweep: the crossover table README quotes. The BNLJ pays
    // n²/2 difflib calls regardless of data; the blocked form pays
    // (prefix candidates) difflib calls + the filter chain's joins —
    // so blocked wins exactly when most pairs fall below the threshold,
    // and the win GROWS quadratically with n.
    def sweep(tag: String, mk: Long => org.apache.spark.sql.DataFrame,
              sizes: Seq[Long], t: Double = 80.0): Unit = sizes.foreach { n =>
      val d = mk(n).localCheckpoint(true)
      val prefixCand = Linker.roBlockCandidates(d, "name", t,
        countFilter = false).count()
      val survivors = Linker.roBlockCandidates(d, "name", t).count()
      val all = n * (n - 1) / 2
      println(f"[roblock] $tag n=$n%5d t=$t%3.0f: allPairs=$all prefix=$prefixCand -> " +
        f"count-filter survivors=$survivors " +
        f"(${100.0 * survivors / all}%.2f%% reach the difflib verify)")
      // two timed rounds each (min-of-2 like Bench; first may pay JIT)
      val bs = (1 to 2).map { _ =>
        time(f"$tag n=$n t=$t blocked") {
          Linker.similarityPairsBlocked(d, "name", t).count()
        }
      }
      val nvs = (1 to 2).map { _ =>
        time(f"$tag n=$n t=$t bnlj") {
          Linker.similarityPairs(d, "name", None, t).count()
        }
      }
      require(bs.head._2 == nvs.head._2,
        s"pair sets disagree at $tag n=$n: blocked=${bs.head._2} naive=${nvs.head._2}")
      println(f"[roblock] $tag n=$n%5d t=$t%3.0f  min blocked=${bs.map(_._1).min}%6.2f s  " +
        f"min bnlj=${nvs.map(_._1).min}%6.2f s  " +
        f"speedup=${nvs.map(_._1).min / bs.map(_._1).min}%5.2fx")
      d.unpersist()
    }
    if (section("diverse")) sweep("diverse", diverse, Seq(2000L, 4000L, 8000L))
    // LONG-KEY corpus: the regime the blocked form exists for. difflib's
    // ratio is superlinear in string length (greedy longest-match
    // recursion), so at ~10x the name length each BNLJ probe costs far
    // more while the blocked form's candidate join still moves narrow
    // 128-bit rows — the verify-savings now dominate the join overhead.
    // Keys: 8 vocabulary words + the digit, ~90 chars, same construction.
    if (section("long")) {
      def longNames(n: Long) = spark.range(n).select(
        concat_ws(" ",
          element_at(vcol, (col("id") % 40 + 1).cast("int")),
          element_at(vcol, (col("id") / 7 % 40 + 1).cast("int")),
          element_at(vcol, (col("id") / 191 % 40 + 1).cast("int")),
          element_at(vcol, (col("id") % 37 % 40 + 1).cast("int")),
          element_at(vcol, (col("id") / 11 % 40 + 1).cast("int")),
          element_at(vcol, (col("id") / 53 % 40 + 1).cast("int")),
          element_at(vcol, (col("id") / 501 % 40 + 1).cast("int")),
          element_at(vcol, (col("id") / 1301 % 40 + 1).cast("int")),
          (col("id") % 13).cast("string")).as("name"))
      sweep("long", longNames, Seq(2000L, 4000L))
    }
    // CHARACTER-DIVERSE corpus: ~22-char names of uniform pseudo-random
    // letters — the regime the filter chain is FOR. Rows come in groups
    // of 5 sharing a random three-6-letter-word stem and differing only
    // in a digit suffix (true near-dups, lev 1 within the group), while
    // CROSS-group stems are independent uniform letters: two such names
    // overlap in ~12 of 20 chars in multiset terms, below the
    // alpha = ceil(t(la+lb)/200) ≈ 18 the count filter demands, and
    // mostly share no rare prefix element at all — so candidates should
    // collapse far below n², unlike the vocab corpora's 70-99%.
    if (section("random") || only("random16")) {
      val letters = array(('a' to 'z').map(c => lit(c.toString)): _*)
      def word(e: org.apache.spark.sql.Column) = {
        // 6 base-26 digits of a 64-bit hash mix, rendered as letters
        val mixed = abs(xxhash64(e))
        concat((0 until 6).map(i =>
          element_at(letters,
            pmod(mixed / lit(math.pow(26, i).toLong.max(1L)), lit(26L))
              .cast("int") + 1)): _*)
      }
      def randomNames(n: Long) = {
        val g = expr("id DIV 5")   // integral division (/ is float div)
        spark.range(n).select(
          concat_ws(" ",
            word(g * 3 + 1), word(g * 3 + 2), word(g * 3 + 3),
            (col("id") % 5).cast("string")).as("name"))
      }
      if (section("random")) {
        sweep("random", randomNames, Seq(4000L, 8000L))
        // THRESHOLD sweep: the prefix size is l − ceil(t·l/(200−t)) + 1 —
        // ~l/3 at t=80 but only ~4 elements at t=90 and ~2 at t=95 on
        // 22-char names, so the exactness-preserving filter sharpens
        // quickly with t. Within-group true pairs (sim ≈ 97) survive all
        // of these thresholds, so the output is identical — this isolates
        // the filter's threshold-selectivity, the crossover IN t.
        Seq(90.0, 95.0).foreach { t =>
          sweep(s"random", randomNames, Seq(4000L), t)
        }
      }
      // the t=95 win must GROW with n (blocked tracks the pruned
      // candidates, the BNLJ tracks n² regardless) — one scale point
      sweep(s"random", randomNames, Seq(16000L), 95.0)
    }
    // BNLJ WALL (round 13): where does the faithful BNLJ actually fall
    // over at the fixture threshold t=80? similarityPairsAuto's
    // `maxBnljNames` default models the answer, and until this sweep it
    // was an argument, not a number. Protocol: random-letters corpus
    // (the filter-friendliest regime — if the blocked form can't win
    // here at t=80 it can't win anywhere at t=80), n doubling from 8k;
    // BNLJ wall time plus its broadcast payload (distinct names × avg
    // bytes — the memory wall the time wall races against); blocked at
    // the base n for the pair-equality check and the constant ratio
    // (its t=80 single-node constant is ~6x the BNLJ's on this corpus —
    // the round-12 crossover table). Measured (this box): the wall is
    // TIME, not memory — 17.4 s at n=8k, ~4x per doubling (~17 us per
    // difflib verify across 32 cores), while the broadcast payload is
    // 0.18 MB at 8k (~23 B/name — memory is nowhere in sight below
    // ~10^8 names). At the 20k default the extrapolated BNLJ wall is
    // ~2 minutes on 32 cores — the single-node latency budget the
    // default encodes; past it neither single-node form is sane and the
    // blocked shape's distributability is the only lever left, 6x
    // constant and all. Sections: `wall` (8k/16k), `wall32` (the 32k
    // confirmation point, ~5 min alone).
    val wallLetters = array(('a' to 'z').map(c => lit(c.toString)): _*)
    def wallWord(e: org.apache.spark.sql.Column) = {
      val mixed = abs(xxhash64(e))
      concat((0 until 6).map(i =>
        element_at(wallLetters,
          pmod(mixed / lit(math.pow(26, i).toLong.max(1L)), lit(26L))
            .cast("int") + 1)): _*)
    }
    def wallNames(n: Long) = {
      val g = expr("id DIV 5")
      spark.range(n).select(
        concat_ws(" ",
          wallWord(g * 3 + 1), wallWord(g * 3 + 2), wallWord(g * 3 + 3),
          (col("id") % 5).cast("string")).as("name"))
    }
    def wallPoint(n: Long, bnljRuns: Int, withBlocked: Boolean): Unit = {
      val d = wallNames(n).localCheckpoint(true)
      val bytes = d.select(sum(length(col("name")))).head.getLong(0)
      println(f"[roblock] wall n=$n%6d t=80: broadcast payload ~${bytes / 1e6}%6.2f MB " +
        f"(${n * (n - 1) / 2}%.3g candidate verifies for the BNLJ)")
      val nv = (1 to bnljRuns).map { _ =>
        time(f"wall n=$n bnlj") {
          Linker.similarityPairs(d, "name", None, 80.0).count()
        }
      }
      if (withBlocked) {
        val bl = time(f"wall n=$n blocked") {
          Linker.similarityPairsBlocked(d, "name", 80.0).count()
        }
        require(nv.head._2 == bl._2,
          s"pair sets disagree at wall n=$n: bnlj=${nv.head._2} blocked=${bl._2}")
        println(f"[roblock] wall n=$n%6d t=80  min bnlj=${nv.map(_._1).min}%7.2f s  " +
          f"blocked=${bl._1}%7.2f s  bnlj/blocked=${nv.map(_._1).min / bl._1}%5.2fx")
      } else {
        println(f"[roblock] wall n=$n%6d t=80  min bnlj=${nv.map(_._1).min}%7.2f s")
      }
      d.unpersist()
    }
    if (section("wall")) {
      wallPoint(8000L, bnljRuns = 2, withBlocked = true)
      wallPoint(16000L, bnljRuns = 1, withBlocked = false)
    }
    if (only("wall32")) wallPoint(32000L, bnljRuns = 1, withBlocked = false)
    spark.stop()
  }
}
