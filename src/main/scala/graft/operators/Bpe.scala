package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine BPE tokenizer training (Sennrich et al. 2016's byte-pair
  * encoding over words — the merge-table learning step every LLM
  * pipeline runs before tokenization; the reference has no tokenizer at
  * all, north-star scope).
  *
  * Classic word-level BPE: words start as character sequences; each
  * round counts adjacent symbol pairs across the corpus (weighted by
  * word frequency), merges the most frequent pair everywhere
  * (left-to-right, non-overlapping), and records it. The learned
  * artifact is the ranked merge list.
  *
  * Scale shape — the part that matters at 100 TB: the ONLY corpus-sized
  * stage is the initial word-frequency hash aggregate. The merge loop
  * runs over the DISTINCT-WORD table (vocabulary-bounded — tens of
  * millions of rows at web scale, not trillions), one pair-count hash
  * aggregate + one bounded-heap argmax + one codegen'd fold per round,
  * with a localCheckpoint per round so lineage stays flat (the PageRank
  * iteration pattern). Driver state: ONE (x, y, count) row per round.
  *
  * Determinism: argmax tie-break is (count DESC, x ASC, y ASC) over
  * binary string order — identical in Spark and DuckDB — and the
  * left-to-right merge fold is order-defined, so the merge table is
  * bit-stable across runs and engines.
  *
  * The merge fold's non-overlap falls out of the algebra: the fold
  * merges when the accumulator's LAST symbol is x and the incoming one
  * is y; a just-merged symbol is x||y, which is strictly longer than x
  * and therefore never equal to it, so a freshly merged token can never
  * immediately re-merge as the left side — exactly the textbook
  * left-to-right non-overlapping scan. (For x == y runs like "aaaa"
  * this yields every other start: aa|aa.) The DuckDB oracle replays the
  * same semantics POSITIONALLY — match starts grouped into consecutive
  * runs, odd positions within each run active — and the two
  * formulations are asserted equal in BpeSpec.
  */
object Bpe {

  /** Escape a symbol for embedding in a Spark SQL string literal:
    * backslash FIRST (Spark's non-ANSI literals treat it as an escape —
    * a corpus token containing one would otherwise corrupt the fold
    * expression), then quote doubling.
    */
  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  /** The character-split expression over a `word` column. */
  private[graft] val CharSplit =
    "transform(sequence(1, length(word)), i -> substring(word, i, 1))"

  /** One left-to-right (x, y) -> x||y merge pass over the symbol-array
    * expression `src`, as a codegen'd `aggregate` fold (no UDF).
    */
  private[graft] def mergeExpr(src: String, x: String, y: String): String = {
    val (lx, ly) = (sqlLit(x), sqlLit(y))
    s"aggregate($src, CAST(array() AS array<string>), (acc, e) -> " +
      s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$lx' AND e = '$ly' " +
      s"THEN concat(slice(acc, 1, size(acc) - 1), array('$lx' || '$ly')) " +
      s"ELSE concat(acc, array(e)) END)"
  }

  /** Distinct lowercased whitespace words with corpus frequencies and
    * their initial character-symbol arrays.
    */
  private def initialSymbols(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      .select(col("word"), col("f"), expr(CharSplit).as("s"))

  /** Train `numMerges` BPE merges. Output: (merge_rank, x, y,
    * pair_count, pass_id) — merge_rank 1-based in learned order;
    * pass_id = the 1-based corpus pass that accepted the merge, so a
    * merge table from batched training (batchM > 1: repeated pass_id
    * values) is distinguishable from sequential output (pass_id ==
    * merge_rank) by inspection — consumers of a merge table can tell
    * which contract produced it. Fewer rows when the corpus runs out of
    * mergeable pairs early (single-char vocabulary). An empty corpus
    * yields an empty merge table.
    *
    * `batchM` batches merge rounds per corpus pass — the lever that
    * makes a 50k-merge vocabulary feasible (sequential BPE is one Spark
    * job per merge; 50k merges = 50k sequential jobs over the
    * vocabulary table). Each pass counts pairs ONCE, then greedily
    * accepts up to batchM candidates in (count DESC, x, y) order that
    * are SYMBOL-DISJOINT from every already-accepted pair in the pass
    * ({x,y} sets don't intersect), applies them as one fused fold
    * chain, and checkpoints once. batchM = 1 (the default) is
    * bit-exact classic BPE. For batchM > 1, disjointness guarantees
    * each accepted pair's own count is what a sequential recount would
    * have shown — but a merge can CREATE a new pair (a, xy) whose count
    * overtakes a later candidate's, which sequential BPE would have
    * picked first; batching trades that reordering (rare on natural
    * vocabularies, bounded to within a pass) for a passes/batchM
    * speedup, the standard batched-BPE engineering compromise. BpeSpec
    * pins M>1 == M=1 on a disjoint-top-pairs corpus; the bpe_batch
    * ScaleProbe measures the wall-clock trade.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            batchM: Int = 1): DataFrame = {
    require(numMerges > 0, s"need numMerges > 0, got $numMerges")
    require(batchM >= 1, s"need batchM >= 1, got $batchM")
    val spark = df.sparkSession
    import spark.implicits._
    var cur = initialSymbols(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Int)]
    var i = 0
    var pass = 0
    var done = false
    while (i < numMerges && !done) {
      val want = math.min(batchM, numMerges - i)
      // Candidate pool: top 4·want pairs is enough to find `want`
      // disjoint ones on real vocabularies; if not, the pass accepts
      // fewer and the next pass recounts. Bounded driver state either
      // way (≤ 4·batchM rows per pass).
      val cands = cur
        .select(col("f"), explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
            "(a, b) -> struct(a AS x, b AS y))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("x"), col("y")).limit(4 * want)
        .as[(String, String, Long)].collect()
      if (cands.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val chosen = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        cands.foreach { case cand @ (x, y, _) =>
          if (chosen.size < want && !used(x) && !used(y)) {
            chosen += cand; used += x; used += y
          }
        }
        pass += 1
        chosen.foreach { case (x, y, c) =>
          merges += ((i + 1, x, y, c, pass)); i += 1
        }
        val folded = chosen.foldLeft("s") { case (acc, (x, y, _)) =>
          mergeExpr(acc, x, y)
        }
        cur = cur.withColumn("s", expr(folded)).localCheckpoint(true)
      }
    }
    merges.toSeq.toDF("merge_rank", "x", "y", "pair_count", "pass_id")
      .select(col("merge_rank").cast("long").as("merge_rank"), col("x"),
        col("y"), col("pair_count"), col("pass_id").cast("long").as("pass_id"))
  }

  /** ENCODE with a trained merge list: per word, replay every merge in
    * rank order; per document, count resulting subword tokens. Output:
    * (idCol, n_words, n_subwords) — the before/after token-budget
    * numbers a pipeline reads off a candidate tokenizer.
    *
    * Scale shape: the fold chain (k nested codegen aggregates, merge
    * literals baked in — no join against the merge table, no UDF) runs
    * once per DISTINCT word; documents re-attach by an equi-join on the
    * word (hot stopwords skew partition volume, AQE rebalances) and
    * aggregate counts. Never a per-occurrence fold.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val folded = merges.foldLeft(CharSplit) { case (acc, (x, y)) =>
      mergeExpr(acc, x, y)
    }
    val occ = df.select(col(idCol),
      explode(TextOps.tokens(lower(col(textCol)))).as("word"))
    val sub = occ.select("word").distinct()
      .withColumn("n_sub", expr(s"size($folded)").cast("long"))
    occ.join(sub, "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }
}
