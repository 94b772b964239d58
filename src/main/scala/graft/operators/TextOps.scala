package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star scope, BASELINE.json): token counting, quality scoring,
  * stopword-based language scoring, and document fingerprinting over the
  * `documents` table.
  *
  * Every function here is a pure narrow projection — no shuffle, fully
  * inside WholeStageCodegen (built-in string/regexp/higher-order functions
  * only, no UDFs) — so at 100 TB these run at parquet-scan speed with
  * column pruning (only `text` + ids are read).
  *
  * Semantics are deliberately chosen to be expressible 1:1 in ANSI/DuckDB
  * SQL (regexp split on \s+, md5 of a normalized form, integer stopword
  * hits) so every operator is oracle-checkable.
  */
object TextOps {

  /** Whitespace tokens of trimmed text; "" -> empty array (split would give
    * [""]).
    */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Long-typed so outputs compare cleanly against DuckDB's BIGINT counts. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Rough BPE-style subword-count estimate: ceil(non-space chars / 4) +
    * token count safeguard — a cheap, deterministic proxy for LLM token
    * budgeting at corpus scale (real BPE needs a vocab; see Scaladoc note).
    */
  def subwordEstimate(c: Column): Column =
    ceil(length(regexp_replace(c, "\\s+", "")).cast("double") / lit(4.0)).cast("long")

  /** GPT-2-style pre-tokenizer pattern, restricted to constructs with
    * identical semantics in Java regex (Spark) and RE2 (DuckDB): English
    * contraction suffixes, space-prefixed letter runs, space-prefixed digit
    * runs, space-prefixed punctuation runs, residual whitespace. The
    * original GPT-2 pattern's `\s+(?!\S)` lookahead is RE2-inexpressible
    * and dropped — trailing-space attachment differs from tiktoken, but the
    * count is deterministic and engine-identical (verified bit-for-bit on
    * the sf0.01 documents fixture).
    */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pre-tokenizer match count — the "BPE-ish regex" LLM token-budget
    * counter (each match is what a byte-level BPE would then split against
    * its vocab; the match count is a far better budget proxy than chars/4
    * because it respects word/number/punct boundaries). Pure codegen'd
    * projection: regexp_extract_all + size, no UDF, scan-speed at 100 TB.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Characters that are not alphanumeric and not whitespace. */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("long")

  /** Canonical normalized form: lowercase, runs of whitespace collapsed to
    * one space, trimmed.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint = md5 of the normalized form — identical across
    * engines (md5 is bit-exact everywhere), used for exact/near-exact dedup
    * at scale: groupBy(fingerprint) is a plain hash aggregate.
    */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Small per-language stopword lists (public, frequency-based). Integer
    * hit counts keep the whole language-ID path FP-free and
    * oracle-comparable.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "se", "del", "por"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "un", "du", "une", "dans"))

  /** Count of tokens (lowercased) contained in `words`. */
  def stopwordHits(c: Column, words: Seq[String]): Column = {
    val lookup = array(words.map(lit): _*)
    size(filter(tokens(lower(c)), t => array_contains(lookup, t))).cast("long")
  }

  /** Per-language hit scores + argmax prediction with deterministic
    * alphabetical tie-break ('xx' when no language scores at all).
    */
  /** Code-switch detection: language-ID every fixed `windowTokens`-token
    * window of a document ([[Chunker.chunkTokens]] → [[languageScores]]),
    * then summarize per doc — (idCol, n_chunks, n_langs, n_switches,
    * dominant_lang). n_switches counts ADJACENT windows that disagree;
    * dominant_lang is the modal window language (ties → alphabetical
    * min, via one min_by over (-count, lang) — the
    * EditDistanceJoin.bestAgainst aggregate-not-window policy). Mixed-
    * language documents (high n_switches / n_langs) are the ones a
    * monolingual pipeline mis-scores everywhere downstream — LM
    * likelihood, stopword quality, tokenizer fit — so this is the
    * routing signal that decides per-language processing.
    *
    * Scale shape: chunking and per-window scoring are shuffle-free
    * codegen projections; the lag window and both aggregates are keyed
    * by document (per-doc-sized partitions, the standard caveat); the
    * dominant join is doc-keyed. Empty docs yield one empty window →
    * 'xx'.
    */
  def codeSwitchStats(df: DataFrame, idCol: String, textCol: String,
                      windowTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = Chunker.chunkTokens(df, idCol, textCol, windowTokens, windowTokens)
    val langd = languageScores(
        ch.select(col(idCol), col("chunk_idx"), col("chunk")), "chunk")
      .select(col(idCol), col("chunk_idx"), col("lang_pred"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("chunk_idx"))
    val sw = langd.withColumn("prev", lag(col("lang_pred"), 1).over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        count_distinct(col("lang_pred")).as("n_langs"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("lang_pred"),
          lit(1L)).otherwise(lit(0L))).as("n_switches"))
    val dom = langd.groupBy(col(idCol), col("lang_pred"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(min_by(col("lang_pred"), struct(-col("c"), col("lang_pred")))
        .as("dominant_lang"))
    sw.join(dom, idCol)
  }

  def languageScores(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted
    // ONE tokenize + ONE array traversal computing every language's hit
    // count (higher-order array functions are CodegenFallback, so the
    // per-language stopwordHits spelling paid |langs| interpreted
    // tokenize+filter passes per row — measured 2.5 s single-task on the
    // sf0.1 scan floor; this form is one pass with |langs| IN-probes per
    // token and cut it to ~0.6 s). Result-identical: same counts per
    // language, token multiplicity preserved.
    def inSet(l: String): String =
      s"CASE WHEN x IN (${stopwords(l).map(w => s"'$w'").mkString(",")}) " +
        "THEN 1L ELSE 0L END"
    val zero = langs.map(l => s"'$l', 0L").mkString("named_struct(", ",", ")")
    val step = langs.map(l => s"'$l', acc.$l + ${inSet(l)}")
      .mkString("named_struct(", ",", ")")
    // lowercase once per token (transform), then fold; the lambda var x
    // is already lowered when the |langs| IN-probes run. The column name
    // goes into generated SQL, so backtick-quote it (names with spaces,
    // dots, or reserved words must resolve the same as col(textCol)).
    val tq = s"`${textCol.replace("`", "``")}`"
    val toksLower =
      s"transform(CASE WHEN length(trim($tq)) = 0 " +
        s"THEN array() ELSE split(trim($tq), '\\\\s+') END, " +
        "t -> lower(t))"
    val scored = langs.foldLeft[DataFrame](
      df.withColumn("__hits",
        expr(s"aggregate($toksLower, $zero, (acc, x) -> $step)"))
    ) { (d, l) =>
      d.withColumn(s"s_$l", col("__hits").getField(l))
    }.drop("__hits")
    val maxScore = greatest(langs.map(l => col(s"s_$l")): _*)
    // foldRight builds when(s_de == max)...otherwise(when(s_en == max)...):
    // the alphabetically FIRST language achieving the max wins the tie.
    val pred = langs.foldRight(lit("xx")) { (l, acc) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Heuristic quality score in [0,1]: rewards texts with a sane token
    * count, moderate average token length, low punctuation density, and
    * some stopword coverage. All-double arithmetic, identical expression
    * tree on both engines.
    */
  def qualityScore(textCol: Column): Column = {
    val nTok = tokenCount(textCol).cast("double")
    val nChar = length(textCol).cast("double")
    val punct = punctCount(textCol).cast("double")
    val stopEn = stopwordHits(textCol, stopwords("en")).cast("double")
    val lenOk = when(nTok >= 10 && nTok <= 5000, lit(1.0)).otherwise(lit(0.5))
    val punctRatio = when(nChar > 0, punct / nChar).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0, stopEn / nTok).otherwise(lit(0.0))
    round(lenOk * lit(0.4) + (lit(1.0) - punctRatio) * lit(0.3) +
      least(stopRatio * lit(5.0), lit(1.0)) * lit(0.3), 6)
  }

  /** Token-repetition stats (the Gopher/C4-style quality signals: a doc
    * whose top token or top bigram dominates is boilerplate or spam).
    * Computed entirely inside one projection — the per-doc mode count is
    * the longest equal-run of the SORTED token array (one O(n log n)
    * sort + one O(n) fold), NOT a groupBy (no shuffle, scan-speed at
    * 100 TB) and NOT the distinct×n nested-HOF probe it replaces — that
    * form paid O(distinct·n) comparisons per document (~600M over the
    * sf0.1 corpus, 5.9 s single-task under full materialization,
    * StageAudit; this form is ~40x fewer element ops).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    def bigrams(arr: Column): Column = graft.functions.word_ngrams(arr, 2)
    // max multiplicity = longest run in sorted order; the fold state is
    // (prev element, current run, best run)
    def topCount(arr: Column): Column =
      coalesce(
        aggregate(array_sort(arr),
          struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
            lit(0L).as("best")),
          (st, x) => {
            val run = when(x === st.getField("prev"),
              st.getField("run") + 1L).otherwise(lit(1L))
            struct(x.as("prev"), run.as("run"),
              greatest(st.getField("best"), run).as("best"))
          },
          st => st.getField("best")),
        lit(0L))
    // FanOut.widen: two array_sort + fold passes per doc are far above
    // scan-speed per row — single-task on an under-partitioned scan
    // (guide §2.5); no-op at corpus scale
    FanOut.widen(df).select(
      col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      topCount(t).as("top_token_n"),
      topCount(bigrams(t)).as("top_bigram_n"))
  }

  /** PII scrub patterns — restricted to constructs with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
    * bounded/unbounded counted repetition, alternation. No lookaround, no
    * backreferences. Replacement order matters: URLs first (they may
    * embed '@' and digits), then emails, then digit runs.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit runs of >= 7 chars allowing space/dash separators (phone
    * numbers, account ids, card numbers).
    */
  val NumberRunPattern = "[0-9][0-9 -]{5,}[0-9]"

  /** Redacts URLs, emails, and long digit runs with typed placeholder
    * tokens — the standard pre-training PII/noise scrub. A pure codegen
    * regexp projection: no shuffle, scan-speed at 100 TB.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      NumberRunPattern, "<NUM>")

  /** Pre-scrub match counts, for audit/reporting alongside [[scrubPii]]. */
  def piiCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      scrubPii(col(textCol)).as("scrubbed"),
      size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)))
        .cast("long").as("n_urls"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(NumberRunPattern), lit(0)))
        .cast("long").as("n_num_runs"))

  /** Full per-document stats projection. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      subwordEstimate(col(textCol)).as("n_subwords_est"),
      punctCount(col(textCol)).as("n_punct"),
      stopwordHits(col(textCol), stopwords("en")).as("n_stop_en"),
      qualityScore(col(textCol)).as("quality"))

  /** Exact-duplicate groups by content fingerprint: one row per distinct
    * fingerprint with member count and canonical (min) doc id.
    */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Sketch-based corpus profile per stratum: doc count, HyperLogLog++
    * estimate of distinct content fingerprints (the dedup-rate probe), and
    * approximate token-count quantiles (p50/p95).
    *
    * This is the 100 TB profiling shape: HLL and the quantile sketch are
    * MERGEABLE partial aggregates — constant per-partition state combined
    * on the reducer — so the profile costs one scan plus a few KB of
    * shuffle per stratum, where the exact forms (count_distinct over
    * fingerprints, exact percentile over all token counts) would shuffle
    * every row's value. Estimates are engine-specific by construction
    * (no DuckDB oracle); accuracy bounds vs the exact answers are
    * asserted in PipelineOpsSpec.
    */
  def corpusStats(df: DataFrame, idCol: String, textCol: String,
                  strataCol: String): DataFrame =
    df.select(col(strataCol), fingerprint(col(textCol)).as("fp"),
        tokenCount(col(textCol)).as("n_tokens"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp"), 0.02).as("approx_distinct_fp"),
        percentile_approx(col("n_tokens"), lit(0.5), lit(10000)).as("p50_tokens"),
        percentile_approx(col("n_tokens"), lit(0.95), lit(10000)).as("p95_tokens"))

  /** Corpus drift detector: the k tokens most over-represented in corpus
    * A vs corpus B and vice versa, scored by the add-1-smoothed unigram
    * odds ratio — the distribution-shift diagnostic run between two crawl
    * snapshots, a corpus and its filtered child, or train vs incoming
    * data, surfacing WHICH vocabulary moved (a KL number says only THAT
    * it moved).
    *
    * Engine-exact determinism for a ratio-valued score: numerator
    * (c_a+1)(T_b+V) and denominator (c_b+1)(T_a+V) are exact BIGINT
    * products (< 2^53, so their double images are exact), and the score
    * is ONE correctly-rounded IEEE-754 division of those two integers —
    * bit-identical in any engine, unlike a log-space KL sum whose
    * transcendentals and reduce order are not portable (the same argument
    * as temperatureRebalance's sqrt). Ties broken by token.
    *
    * Scale shape: two token-count aggregates (map-side combinable,
    * vocab-bounded) full-outer-joined on token, then global top-k via
    * sort-limit (TakeOrdered — per-partition k then driver merge of
    * numPartitions*k rows, no global sort materialization, no window).
    * The three scalar totals come to the driver (3 longs, same bound as
    * the CC convergence signature); the joined vocab frame is
    * localCheckpointed so the totals action doesn't recompute it.
    */
  def domainShiftTokens(a: DataFrame, b: DataFrame, textCol: String,
                        k: Int): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(tokens(lower(col(textCol)))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(out))
    val j = counts(a, "c_a").join(counts(b, "c_b"), Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .localCheckpoint()
    val tot = j.agg(sum("c_a"), sum("c_b"), count(lit(1))).head()
    if (tot.isNullAt(0) && tot.isNullAt(1))
      return j.select(lit("a").as("direction"), col("token"), col("c_a"),
        col("c_b"), lit(0.0).as("ratio")).limit(0)
    val (ta, tb, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val scored = j.withColumn("ratio",
      ((col("c_a") + 1L) * lit(tb + v)).cast("double") /
        ((col("c_b") + 1L) * lit(ta + v)).cast("double"))
    scored.orderBy(col("ratio").desc, col("token")).limit(k)
      .select(lit("a").as("direction"), col("token"), col("c_a"), col("c_b"),
        col("ratio"))
      .unionByName(
        scored.orderBy(col("ratio").asc, col("token")).limit(k)
          .select(lit("b").as("direction"), col("token"), col("c_a"),
            col("c_b"), col("ratio")))
  }

  /** Incremental distinct counting via MERGEABLE DataSketches HLL — the
    * profiling shape for a corpus that arrives in increments: build one
    * compact binary sketch PER STRATUM (per day / per source / per
    * partition in production), persist them, and answer "distinct across
    * any union of increments" by merging sketches — never rescanning the
    * 100 TB that produced them. `approx_count_distinct` cannot do this:
    * its HLL state never leaves the aggregation, so every new question is
    * a new full scan. `hll_sketch_agg`'s state is a first-class binary
    * column.
    *
    * Output (oracle-checkable in the same audited-sketch shape as
    * [[corpusStatsAudit]]): one row per stratum plus an `__all__` row
    * whose estimate comes ONLY from merging the per-stratum sketches
    * (`hll_union_agg`) — exactly what an incremental pipeline would do —
    * each carrying the exact count and a within-10%-of-exact flag
    * (default lgConfigK=12 → rsd ≈ 1.6%; 10% is >5 sigma). The exact
    * counts are the audit tier's cost, paid here so the sketch path is
    * hash-gated; production persists the sketch column and skips them.
    */
  def sketchDistinctAudit(df: DataFrame, textCol: String,
                          strataCol: String): DataFrame = {
    val base = df.select(col(strataCol).as("stratum"),
      fingerprint(col(textCol)).as("fp"))
    val per = base.groupBy("stratum").agg(
      count(lit(1)).as("n_docs"),
      count_distinct(col("fp")).as("n_distinct"),
      hll_sketch_agg(col("fp")).as("sk"))
    def ok(est: Column, exact: Column) =
      abs(est.cast("double") - exact.cast("double")) <= exact.cast("double") * 0.10
    val perRows = per.select(col("stratum"), col("n_docs"), col("n_distinct"),
      ok(hll_sketch_estimate(col("sk")), col("n_distinct")).as("hll_ok"))
    // the union row: exact global distinct from the base (audit only);
    // the ESTIMATE strictly from merging the per-stratum sketches. The
    // two single-row frames are combined by union + one aggregate, never
    // a join — gluing two 1-row aggregates with a (cross)join plans as a
    // nested loop, which the cartesian-free guarantee in
    // PlanGuaranteesSpec bans across every query (FoldablePropagation
    // even folds a literal-key equi-join back into a cross join).
    val globalExact = base.agg(count(lit(1)).as("n_docs"),
      count_distinct(col("fp")).as("n_distinct"))
      .select(col("n_docs"), col("n_distinct"),
        lit(null).cast("binary").as("sk"))
    val merged = per.agg(hll_union_agg(col("sk")).as("sk"))
      .select(lit(null).cast("long").as("n_docs"),
        lit(null).cast("long").as("n_distinct"), col("sk"))
    val allRow = globalExact.unionByName(merged)
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("n_distinct")).as("n_distinct"),
        first(col("sk"), ignoreNulls = true).as("sk"))
      .select(lit("__all__").as("stratum"), col("n_docs"), col("n_distinct"),
        // Degenerate corpus: no strata -> no sketches to merge -> sk is
        // NULL and the estimate comparison would yield NULL, while the
        // oracle emits a literal TRUE ('__all__', 0, 0, TRUE). Coalesce
        // to "exactly zero distinct" so an empty fixture reads as the
        // clean signal it is, not a hash mismatch.
        coalesce(ok(hll_sketch_estimate(col("sk")), col("n_distinct")),
          col("n_distinct") === 0L).as("hll_ok"))
    perRows.unionByName(allRow)
  }

  /** Oracle-checkable audit of [[corpusStats]]'s sketches: per stratum,
    * the exact doc count plus one boolean per sketch column saying whether
    * the estimate honors its published error bound against the exact
    * answer computed in the same job.
    *
    *  - `hll_ok`: approx_count_distinct (rsd 0.02) within 10% (5 sigma) of
    *    the exact distinct-fingerprint count.
    *  - `p50_ok`/`p95_ok`: the value percentile_approx returned is a valid
    *    q-quantile up to the sketch's rank error — its strict-below count
    *    is at most q*n + slack and its at-or-below count at least
    *    q*n - slack, slack = n/accuracy + 1 (the +1 absorbs discreteness;
    *    ties make a naive "cnt_le/n ≈ q" check wrong, hence the two-sided
    *    rank containment).
    *
    * This closes the one no-oracle gap the sketch estimates left: the
    * engine-specific VALUES can't be matched by another engine, but the
    * CLAIM each sketch makes is checkable anywhere — the DuckDB oracle
    * asserts exact n_docs and literal TRUE per flag, so a sketch drifting
    * out of bound is a hash mismatch, not a silent weak check. Same
    * measure-then-trust pattern as lshRecallEval: the audit pays the exact
    * shuffle [[corpusStats]] avoids, so it runs on the calibration sample
    * tier, and the production corpus gets the sketch-only scan.
    */
  def corpusStatsAudit(df: DataFrame, idCol: String, textCol: String,
                       strataCol: String): DataFrame = {
    val sk = corpusStats(df, idCol, textCol, strataCol)
    val base = df.select(col(strataCol), fingerprint(col(textCol)).as("fp"),
      coalesce(tokenCount(col(textCol)), lit(0L)).as("nt"))
    val exact = base.groupBy(col(strataCol))
      .agg(count_distinct(col("fp")).as("x_fp"))
    // rank the returned percentile values inside their stratum (sk is
    // one row per stratum — AQE broadcasts it from measured size)
    val ranks = base
      .join(sk.select(col(strataCol), col("p50_tokens"), col("p95_tokens")),
        Seq(strataCol))
      .groupBy(col(strataCol))
      .agg(
        sum(when(col("nt") < col("p50_tokens"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("nt") <= col("p50_tokens"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("nt") < col("p95_tokens"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("nt") <= col("p95_tokens"), 1L).otherwise(0L)).as("le95"))
    def qOk(q: Double, lt: String, le: String) = {
      val n = col("n_docs").cast("double")
      val slack = n / 10000d + lit(1d)
      (col(lt).cast("double") <= n * q + slack) &&
        (col(le).cast("double") >= n * q - slack)
    }
    sk.join(exact, Seq(strataCol)).join(ranks, Seq(strataCol))
      .select(col(strataCol), col("n_docs"),
        (abs(col("approx_distinct_fp").cast("double") - col("x_fp")) <=
          col("x_fp") * 0.10).as("hll_ok"),
        qOk(0.5, "lt50", "le50").as("p50_ok"),
        qOk(0.95, "lt95", "le95").as("p95_ok"))
  }

  /** Exact per-stratum corpus profile — the sample-tier twin of
    * [[corpusStats]]: same columns, exact values (count_distinct over
    * fingerprints; discrete percentiles of the integer token counts), so
    * the whole profile is engine-exact and DuckDB-oracled. The production
    * workflow pairs them: run THIS on a sample tier to calibrate the
    * sketch settings, then trust [[corpusStats]]'s mergeable sketches on
    * the full corpus (the same measure-then-trust shape as lshRecallEval).
    *
    * Percentile definition (deterministic, integer-only): pXX = the
    * smallest token count nt with |docs with n_tokens <= nt| * 100 >=
    * XX * n_docs — no FP interpolation, so both engines agree bit-for-bit.
    * Scale shape: the cumulative window runs over the per-(stratum,
    * token-count) aggregate — bounded by the distinct value count, not the
    * corpus — and count_distinct(fp) is the one genuinely corpus-sized
    * shuffle, which is exactly the cost [[corpusStats]] exists to avoid.
    */
  def corpusProfile(df: DataFrame, idCol: String, textCol: String,
                    strataCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null text counts as 0 tokens on BOTH engines: a null nt would sort
    // FIRST in Spark's cumulative window but LAST (and out of min()) in
    // DuckDB's, silently skewing the percentiles apart.
    val base = df.select(col(strataCol), fingerprint(col(textCol)).as("fp"),
      coalesce(tokenCount(col(textCol)), lit(0L)).as("nt"))
    val tot = base.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("fp")).as("n_distinct_fp"))
    val cts = base.groupBy(col(strataCol), col("nt")).agg(count(lit(1)).as("c"))
    val cum = cts
      .withColumn("cum", sum("c").over(
        Window.partitionBy(strataCol).orderBy("nt")))
      .withColumn("total", sum("c").over(Window.partitionBy(strataCol)))
    val pct = cum.groupBy(col(strataCol)).agg(
      min(when(col("cum") * 2 >= col("total"), col("nt"))).as("p50_tokens"),
      min(when(col("cum") * 20 >= col("total") * 19, col("nt"))).as("p95_tokens"))
    tot.join(pct, strataCol)
  }

  /** Top-N token bigrams with their unigram counts — the integer inputs
    * to any association score (PMI, log-likelihood ratio, t-score):
    * emitting (n_xy, n_x, n_y) instead of the score keeps the output
    * engine-exact (association scores are logs of ratios — FP; the counts
    * are the sufficient statistics). Collocation mining is a standard
    * corpus-analysis pass (phrase vocabularies, tokenizer merges,
    * MWE detection).
    *
    * Shape: two hash aggregates (bigrams with multiplicity via the
    * word_ngrams codegen kernel, unigrams via explode) + two joins of the
    * top-N set against the unigram counts; top-N is
    * TakeOrderedAndProject (bounded heap), never a global sort.
    */
  def bigramStats(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val bg = df.select(explode(graft.functions.word_ngrams(toks, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_xy"))
      .orderBy(col("n_xy").desc, col("bigram")).limit(topN)
    val un = df.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    bg
      .join(un.as("ux"), split(col("bigram"), " ").getItem(0) === col("ux.tok"))
      .join(un.as("uy"), split(col("bigram"), " ").getItem(1) === col("uy.tok"))
      .select(col("bigram"), col("n_xy"),
        col("ux.n").as("n_x"), col("uy.n").as("n_y"))
  }

  /** Tokenizer vocabulary coverage: per-document out-of-vocabulary
    * statistics against the corpus top-`vocabSize` token vocabulary — the
    * tokenizer-fit metric a pipeline reads before committing to a vocab
    * (high OOV strata fragment into bytes/UNKs and train badly; the same
    * scan decides whether a vocab transfers to a new source mix). Output:
    * one row per document — (idCol, n_tokens, n_oov, oov_permille) with
    * oov_permille = floor(1000 * n_oov / n_tokens) as exact integer
    * division (0 for empty docs), so every column hash-checks.
    *
    * Shape: one hash aggregate builds token frequencies; top-N is
    * TakeOrderedAndProject with the (count desc, token asc) tie-break
    * (deterministic across engines); the vocab is bounded by CONSTRUCTION
    * at vocabSize rows, so the membership join is a legitimate forced
    * broadcast; per-doc accounting is one more hash aggregate. Nothing
    * shuffles more than the (doc, token) explode.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocabSize: Int): DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(true).as("_in_vocab"))
    val per = toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("_in_vocab").isNull, 1)).as("n_oov"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_permille",
        expr("CASE WHEN n_tokens = 0 THEN 0L ELSE (n_oov * 1000) DIV n_tokens END"))
  }

  /** Gopher duplicate-n-gram fraction: per document, how much of the
    * n-gram stream sits inside n-grams that occur MORE THAN ONCE within
    * that same document — the repetition rule that catches looping
    * machine-generated pages that per-token dominance ([[repetitionStats]])
    * misses once the loop is longer than a token or bigram. Counts follow
    * the Gopher convention (ALL occurrences of a duplicated gram count,
    * including the first); dup_permille = floor(1000 * n_dup / n_grams)
    * is exact integer division so every column hash-checks. Docs shorter
    * than n tokens report (0, 0, 0, 0).
    *
    * Shape: the word_ngrams codegen kernel emits the gram stream in the
    * scan projection; counting is two hash aggregates keyed by (doc,
    * gram) then doc — per-document keys, corpus-linear, no global hot key
    * (a gram repeated inside one doc is bounded by that doc's length).
    */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val g = df.select(col(idCol),
      explode(graft.functions.word_ngrams(tokens(lower(col(textCol))), n))
        .as("gram"))
    val per = g.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_permille",
        expr("CASE WHEN n_grams = 0 THEN 0L ELSE (n_dup * 1000) DIV n_grams END"))
  }

  /** EXACT corpus-wide heavy-hitter tokens (frequency > n_tokens/(k+1))
    * via candidates-then-verify: a Misra-Gries sketch
    * ([[graft.functions.HeavyHitters]]) reduces the corpus map-side to a
    * <= k-entry candidate set (KBs through the shuffle, never the token
    * domain), a second pass exactly recounts ONLY the candidates
    * (broadcast isin filter -> hash agg over a tiny key set), and the MG
    * guarantee — every item above the threshold survives the sketch —
    * makes the thresholded result exactly the true heavy hitters. The
    * sketch's order-dependent extra candidates are filtered away by their
    * exact counts, so the OUTPUT is deterministic and oracle-able even
    * though the sketch state is not. Compare `vocabTop`: exact top-N by
    * full hash aggregation over every distinct token — fine when the
    * token domain fits a shuffle, wrong cost at web scale.
    */
  def heavyHitterTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = df.select(explode(tokens(col(textCol))).as("token"))
      .localCheckpoint(true) // consumed twice: sketch pass + recount pass
    val row = toks.agg(count(lit(1)).as("n"),
      graft.functions.HeavyHitters
        .heavy_hitter_candidates(col("token"), k).as("cands")).head()
    val n = row.getLong(0)
    val cands = row.getSeq[String](1)
    // empty corpus -> empty candidate set; isin() with zero values is not
    // a well-defined predicate, so short-circuit to a constant-false filter
    val candFilter =
      if (cands.isEmpty) lit(false) else col("token").isin(cands: _*)
    toks.filter(candFilter)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(n).cast("double") / (k + 1))
  }

  /** Corpus "data card": per-stratum doc counts, distinct content
    * fingerprints, token totals, and a fixed-point quality sum — the
    * per-(language, source) report a training-data pipeline publishes
    * with every corpus release. One map-side-combinable hash aggregate
    * over a codegen'd projection; output rows = stratum cardinality.
    * The quality sum is micro-scaled to BIGINT (same trick as
    * Ann.labelCentroids) so the aggregate is independent of FP
    * accumulation order — consumers derive the mean on their own FP
    * terms from (sum, count).
    */
  def dataCard(df: DataFrame, textCol: String, dims: Seq[String]): DataFrame =
    df.select(dims.map(col) ++ Seq(
        fingerprint(col(textCol)).as("fp"),
        qualityScore(col(textCol)).as("q"),
        tokenCount(col(textCol)).as("nt")): _*)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("fp")).as("n_distinct_fp"),
        sum(col("nt")).as("n_tokens"),
        sum(expr("CAST(round(q * 1000000) AS BIGINT)")).as("quality_micro_sum"))

  /** Gopher-style rule filter (Rae et al. 2021, appendix A — public):
    * per-document booleans for the four classic structural rules (word
    * count in [50, 100k], mean word length in [3, 10], >= 80% of words
    * contain a letter, >= 2 English stopwords) plus the conjunction as
    * `keep`. Unlike [[qualityScore]]'s scalar blend, every rule is an
    * auditable column, so rejection reasons are countable per source and
    * thresholds can be re-tuned from the same output. One shuffle-free
    * codegen projection — scan-speed at 100 TB. Rules involving a ratio
    * are explicitly false for zero-token documents (coalesce, not
    * three-valued null logic) so `keep` is always a real boolean.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nW = size(toks).cast("long")
    val nonSpace = length(regexp_replace(t, "\\s", "")).cast("long")
    val alphaW = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val meanLen = when(nW > 0, nonSpace.cast("double") / nW)
    val rWords = nW >= 50 && nW <= 100000
    val rMeanLen = coalesce(meanLen >= 3.0 && meanLen <= 10.0, lit(false))
    val rAlpha = coalesce(
      when(nW > 0, alphaW.cast("double") / nW >= 0.8), lit(false))
    val rStop = stopwordHits(t, stopwords("en")) >= 2
    df.select(col(idCol), nW.as("n_words"), meanLen.as("mean_word_len"),
      rWords.as("r_word_count"), rMeanLen.as("r_mean_len"),
      rAlpha.as("r_alpha_ratio"), rStop.as("r_stopwords"),
      (rWords && rMeanLen && rAlpha && rStop).as("keep"))
  }

  /** Blocklist ("badwords") safety screen — the C4/CCNet-style filter
    * that drops or flags documents containing terms from a curated
    * denylist. Emits per-document `n_blocked` (token occurrences hitting
    * the list) and a `keep` flag instead of silently filtering, so the
    * rejection rate is auditable and thresholds can move without a
    * rescan. The list rides the expression tree as a literal array
    * (broadcast-equivalent; real-world lists are thousands of terms —
    * still KBs) and the whole screen is one shuffle-free codegen'd
    * projection: scan-speed at 100 TB.
    */
  def blocklistFlags(df: DataFrame, idCol: String, textCol: String,
                     blocklist: Seq[String]): DataFrame =
    df.select(col(idCol),
      stopwordHits(col(textCol), blocklist.map(_.toLowerCase)).as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0)

  /** Unigram corpus-frequency ("LM rarity") document scoring — the
    * sufficient-statistics half of a KenLM-style perplexity filter
    * (CCNet/RefinedWeb shape): score each document by how common its
    * tokens are in the corpus itself. Emits exact integers only
    * (`freq_weight` = sum over token occurrences of that token's corpus
    * count; `rarest_freq` = the rarest token's corpus count), so the
    * result is engine-reproducible and DuckDB-oracled — a downstream
    * filter derives mean-log-frequency or perplexity from these on its
    * own FP terms.
    *
    * Scale shape: tokens are collapsed to per-document multiplicities
    * FIRST (one row per (doc, distinct token) — bounds any token's join
    * fan-out at nDocs instead of total occurrences), then the global
    * count table is equi-joined back. Both aggregates are map-side
    * combinable; the join's hot keys (stopwords) are docs-per-token
    * bounded and AQE skew-split handles the residue. The doc-token
    * multiset subtree feeds both the count build and the probe side —
    * two evaluations of one scan+partial-agg, each scale-flat, rather
    * than materializing a corpus-sized checkpoint.
    */
  def rarityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docTok = df
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("k"))
    val counts = docTok.groupBy("token").agg(sum("k").as("corpus_n"))
    docTok.join(counts, Seq("token"))
      .groupBy(idCol)
      .agg(sum(col("k")).cast("long").as("n_tokens"),
        sum(col("k") * col("corpus_n")).cast("long").as("freq_weight"),
        min(col("corpus_n")).cast("long").as("rarest_freq"))
  }

  /** EXACT per-group discrete quantiles of a bounded-domain integer column
    * (length/token-count planning: sequence-packing capacity, truncation
    * budgets). percentile_disc semantics — the quantile is the smallest
    * VALUE whose cumulative count reaches ceil(p·n/100), an element of the
    * data, computed with all-integer arithmetic (engine-exact, unlike
    * interpolating percentile_cont on doubles).
    *
    * The 100 TB shape for exact quantiles: never a per-group sort of rows
    * — a hash aggregate to the (group, value) HISTOGRAM (bounded: lengths
    * have thousands of distinct values no matter how many rows), then a
    * window prefix-sum over that tiny frame. An approx sketch
    * (approx_percentile) trades that exactness for mergeability on
    * UNBOUNDED domains; for bounded domains the histogram IS the
    * mergeable sketch, with zero error.
    */
  def lengthQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    // percentile_disc is defined over the NON-NULL values: an unfiltered
    // null bucket would both inflate the group total and (nulls-first
    // window order) every value's cumulative count, dragging quantiles low
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("v")
    val cum = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("total", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    cum.withColumn("pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
      // integer cum >= ceil(p*total/100)  <=>  100*cum >= p*total
      .filter(col("cum") * 100 >= col("pct") * col("total"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min("v").as("value"))
  }
}
