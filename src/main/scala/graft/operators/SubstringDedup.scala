package graft.operators

import graft.functions.md5hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level exact substring dedup — the repeated-passage tier between
  * whole-document dedup (exact / near / fingerprint, all in [[Dedup]] /
  * [[NearDup]] / [[TextOps]]) and nothing: find the MAXIMAL token runs
  * shared verbatim between document pairs and optionally rewrite documents
  * with those runs removed. This is the cross-document repeated-span
  * removal a training corpus needs for boilerplate paragraphs, quoted
  * passages, and licence blocks that survive document-level dedup because
  * the host documents differ (the suffix-array dedup tier of LLM data
  * pipelines, e.g. Lee et al. 2021 "Deduplicating Training Data Makes
  * Language Models Better" — public literature; implemented here with
  * positioned k-gram postings instead of a monolithic suffix array, which
  * is the join-friendly formulation a distributed engine wants).
  *
  * Method: every document emits one row per token position — the md5-based
  * hash of the k-gram starting there. A posting-list equi-join on the gram
  * hash yields matching position pairs; on any shared verbatim run the
  * matches line up on one diagonal (pos_a - pos_b constant) at consecutive
  * pos_a, so maximal shared runs are exactly the gaps-and-islands groups
  * per (pair, diagonal), and a run of g consecutive grams covers
  * g + k - 1 tokens. Runs shorter than k tokens are invisible by
  * construction (k is the detection floor).
  *
  * Scale, 100 TB posture: positioned grams are one row per corpus token
  * (linear, codegen projection); the only shuffle is the gram-hash
  * equi-join (same shape and skew guard as [[NearDup.jaccardPairs]]); the
  * island window sorts within (pair, diagonal) groups, which are bounded
  * by per-pair overlap, never corpus-sized. No O(n²) step anywhere.
  *
  * Oracle parity: the gram hash is [[md5hash60]] over the space-joined
  * k-gram (bit-identical in DuckDB), positions and lengths are integers —
  * the whole report and the rewrite are hash-checked against DuckDB
  * (q_substring_spans / q_substring_dedup). A 60-bit hash equality can in
  * principle alias distinct grams (~n²/2^61 pair risk); both engines hash
  * identically so the compare is unaffected, and the join could carry the
  * gram text instead for a collision-free (wider-shuffle) variant.
  */
object SubstringDedup {

  /** Default k-gram width: shared runs of >= k tokens are detectable. */
  val GramTokens = 3

  /** One row per token position: (id, pos [1-based], gh) — the md5hash60
    * of the k-gram starting at pos over lowercased whitespace tokens
    * (case-insensitive matching; positions index the ORIGINAL token
    * sequence, which lowercasing leaves unchanged). Documents with fewer
    * than k tokens emit no rows.
    */
  def positionedGrams(df: DataFrame, idCol: String, textCol: String,
                      k: Int = GramTokens): DataFrame =
    // Deliberately NOT FanOut.widen'd (optimization round 19): measured
    // across the three consumer rows in two windows, the widen was
    // noise-neutral on q_substring_{spans,dedup} and a consistent 1.4x
    // LOSS on q_redact_eval (the added exchange lands inside the
    // hot-gram guard's eager localCheckpoint, materializing an extra
    // pass) — the same net-loss lesson as NearDup.shingles in round 18.
    df.select(col(idCol).as("id"),
        posexplode(graft.functions.word_ngrams(
          TextOps.tokens(lower(col(textCol))), k)).as(Seq("p", "gram")))
      .select(col("id"), (col("p") + 1).cast("long").as("pos"),
        md5hash60(col("gram")).as("gh"))

  /** Maximal shared token runs per document pair: (id_a < id_b, start_a,
    * start_b, len_tokens) for every maximal verbatim run of at least
    * `minTokens` tokens (minTokens >= k). A passage appearing twice in one
    * document matches on two diagonals and reports two spans — each copy
    * is located, which is what a removal pass needs.
    *
    * `maxDocFreq` is the d² hot-key guard of
    * [[NearDup.shinglesWithSkewGuard]] applied to gram hashes: grams in
    * more than maxDocFreq·nDocs documents (licence boilerplate) are
    * dropped before pairing, which splits runs crossing them — the
    * documented trade for keeping the join linear on a
    * boilerplate-dominated corpus.
    */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Int, k: Int = GramTokens,
                  maxDocFreq: Option[Double] = None): DataFrame = {
    require(minTokens >= k, s"minTokens ($minTokens) must be >= k ($k)")
    val pg0 = positionedGrams(df, idCol, textCol, k)
    val pg = maxDocFreq match {
      case None => pg0
      case Some(f) =>
        // same materialize-once + tiny-hot-set broadcast anti join as
        // NearDup.shinglesWithSkewGuard (see that Scaladoc for the
        // localCheckpoint lifecycle reasoning)
        val pgc = pg0.localCheckpoint(true)
        val nDocs = df.select(col(idCol)).distinct().count()
        val hot = pgc.groupBy("gh")
          .agg(count_distinct(col("id")).as("df"))
          .filter(col("df") > f * nDocs)
          .select("gh")
        pgc.join(broadcast(hot), Seq("gh"), "left_anti")
    }
    // shuffle_hash: post-explode cardinality is opaque to Catalyst (same
    // rationale as NearDup.jaccardPairs)
    val pairs = pg.as("a").hint("shuffle_hash").join(pg.as("b"),
        col("a.gh") === col("b.gh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val diag: Column = col("pa") - col("pb")
    val w = Window.partitionBy(col("id_a"), col("id_b"), diag).orderBy("pa")
    // gaps-and-islands: consecutive pa on one diagonal share pa - row_number
    pairs.withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), diag.as("diag"), col("island"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + (k - 1)).as("len_tokens"))
      .filter(col("len_tokens") >= minTokens)
      .select("id_a", "id_b", "start_a", "start_b", "len_tokens")
  }

  /** Decontamination by REDACTION — the surgical alternative to dropping
    * a contaminated document whole ([[Winnow.contaminationScore]] /
    * exact-n-gram flagging): locate every maximal train-side token run of
    * at least `minTokens` tokens shared verbatim with ANY eval document,
    * and rewrite the train doc with those runs removed. A 10k-token
    * document carrying one leaked benchmark question keeps its other
    * 9.9k tokens — at 100 TB the data kept by redacting instead of
    * dropping is substantial, which is why production pipelines offer
    * both verdict-level and span-level decontamination.
    *
    * Same diagonal/islands method as [[sharedSpans]] with the posting
    * join crossed train×eval (no id ordering — the sides are different
    * corpora); spans land on the TRAIN side only and every train doc
    * comes back (text_redacted, n_removed), leaked or not. `maxDocFreq`
    * prunes grams by TRAIN-side doc frequency (a gram hot on the train
    * side dominates the join whatever the eval side holds) — same
    * hot-key trade as [[sharedSpans]].
    */
  def redactEvalSpans(train: DataFrame, eval: DataFrame, idCol: String,
                      textCol: String, minTokens: Int, k: Int = GramTokens,
                      maxDocFreq: Option[Double] = None): DataFrame = {
    require(minTokens >= k, s"minTokens ($minTokens) must be >= k ($k)")
    val pgT0 = positionedGrams(train, idCol, textCol, k)
    val pgT = maxDocFreq match {
      case None => pgT0
      case Some(f) =>
        val pgc = pgT0.localCheckpoint(true)
        val nDocs = train.select(col(idCol)).distinct().count()
        val hot = pgc.groupBy("gh")
          .agg(count_distinct(col("id")).as("df"))
          .filter(col("df") > f * nDocs)
          .select("gh")
        pgc.join(broadcast(hot), Seq("gh"), "left_anti")
    }
    val pgE = positionedGrams(eval, idCol, textCol, k)
    val pairs = pgT.as("a").hint("shuffle_hash").join(pgE.as("b"),
        col("a.gh") === col("b.gh"))
      .select(col("a.id").as("tid"), col("b.id").as("eid"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val diag: Column = col("pa") - col("pb")
    val w = Window.partitionBy(col("tid"), col("eid"), diag).orderBy("pa")
    val spans = pairs.withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("tid"), col("eid"), diag.as("diag"), col("island"))
      .agg(min(col("pa")).as("start_t"),
        (count(lit(1)) + (k - 1)).as("len_tokens"))
      .filter(col("len_tokens") >= minTokens)
    val rem = spans
      .select(col("tid").as("id"),
        explode(sequence(col("start_t"),
          col("start_t") + col("len_tokens") - 1)).as("pos"))
      .distinct()
    val toks = train.select(col(idCol).as("id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p", "tok")))
      .select(col("id"), (col("p") + 1).cast("long").as("pos"), col("tok"))
    val kept = toks.join(rem, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("text_redacted"))
    val nRemoved = rem.groupBy("id").agg(count(lit(1)).as("n_removed"))
    train.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .join(nRemoved, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_redacted"), lit("")).as("text_redacted"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** The rewrite pass: every document with the tokens covered by any
    * [[sharedSpans]] span REMOVED from the higher-id side of each pair —
    * the lower id keeps the passage (canonical-keeper convention, matching
    * [[Dedup]]'s min-key survivor). Output: one row per input document
    * with the rebuilt text (original-case tokens re-joined with single
    * spaces — whitespace is normalized by construction) and the removed
    * token count.
    *
    * Scale: the removal set is one row per REMOVED token (linear in
    * duplicated content, not the corpus); the rebuild is a per-document
    * sort-aggregate over kept tokens — per-doc state bounded by document
    * size, the same class as any content aggregation.
    */
  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
                        minTokens: Int, k: Int = GramTokens,
                        maxDocFreq: Option[Double] = None): DataFrame = {
    val spans = sharedSpans(df, idCol, textCol, minTokens, k, maxDocFreq)
    val rem = spans
      .select(col("id_b").as("id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("len_tokens") - 1)).as("pos"))
      .distinct()
    val toks = df.select(col(idCol).as("id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p", "tok")))
      .select(col("id"), (col("p") + 1).cast("long").as("pos"), col("tok"))
    val kept = toks.join(rem, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("text_dedup"))
    val nRemoved = rem.groupBy("id").agg(count(lit(1)).as("n_removed"))
    df.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .join(nRemoved, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
