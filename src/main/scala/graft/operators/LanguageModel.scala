package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring — the perplexity-style
  * quality filter of a training-data pipeline (CCNet/C4 keep documents
  * whose token transitions look like the target domain; the reference has
  * no text scoring at all, north-star scope).
  *
  * The model is add-one-smoothed bigram MLE over lowercased whitespace
  * tokens: p(y|x) = (c(x,y) + 1) / (c(x,·) + V), with c(x,·) the count of
  * x as a bigram CONTEXT (token occurrences that have a successor) and V
  * the training vocabulary size. A document's score is the mean
  * transition likelihood over its adjacent-token bigrams.
  *
  * FP parity (the repo-wide contract — see TfIdf's Scaladoc): the
  * textbook form is mean LOG-likelihood, but libm `ln` differs in the
  * last ulp between the JVM and DuckDB, so each bigram's probability is
  * instead frozen to fixed point — p_e12 = round(1e12 · p) as BIGINT,
  * where p is ONE correctly-rounded IEEE division and the 1e12 scaling
  * ONE correctly-rounded multiply, bit-identical across engines — and
  * documents aggregate p_e12 with exact integer sums (order-independent,
  * unlike a double sum). The mean-probability score ranks "familiar
  * transitions" the same direction as perplexity for filtering purposes
  * and keeps every emitted column hash-checkable.
  *
  * Scale shape, 100 TB posture: bigram extraction is the word_ngrams
  * codegen kernel (scan-speed projection); model counts are two hash
  * aggregates over (x,y) and x; scoring re-attaches counts by equi-join
  * on the bigram/context (the model side has one row per DISTINCT bigram
  * — a hot stopword transition skews partition volume, which AQE
  * rebalances, but never fans out rows); V and the guard are a one-row
  * broadcast. No all-pairs, no window over the corpus, no driver loop.
  */
object LanguageModel {

  private def toks(textCol: String): Column =
    TextOps.tokens(lower(col(textCol)))

  /** (id, bigram) rows with multiplicity — one row per adjacent token
    * pair occurrence; docs with < 2 tokens emit nothing.
    */
  private def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.word_ngrams(toks(textCol), 2)).as("bigram"))
      .withColumn("ctx", split(col("bigram"), " ").getItem(0))

  /** Score `score`'s documents under the bigram model trained on `train`.
    * Output: one row per scored document that has >= 1 bigram —
    * (idCol, n_bigrams, sum_p_e12, avg_p_e12), avg as exact integer
    * division sum/n. Bigrams unseen in training back off through the same
    * smoothed formula (c(x,y) and c(x,·) coalesce to 0 → p = 1/V ...
    * (1+0)/(0+V)). An EMPTY training corpus has V = 0 and no defined
    * model: the guard `V > 0` makes every score row vanish instead of
    * emitting a division artifact — mirrored verbatim in the oracle.
    */
  def scoreAgainst(train: DataFrame, score: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val tbg = bigramRows(train, idCol, textCol)
    val cxy = tbg.groupBy("bigram").agg(count(lit(1)).as("c_xy"))
    val cx = tbg.groupBy("ctx").agg(count(lit(1)).as("c_x"))
    val vocab = train
      .select(explode(toks(textCol)).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val sbg = bigramRows(score, idCol, textCol)
    val p = sbg
      .join(cxy, Seq("bigram"), "left")
      .join(cx, Seq("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .filter(col("v") > 0)
      .withColumn("p_e12",
        round(lit(1.0e12) *
          ((coalesce(col("c_xy"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("c_x"), lit(0L)) + col("v")).cast("double")))
          .cast("long"))
    p.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_e12")).as("sum_p_e12"))
      .withColumn("avg_p_e12", expr("sum_p_e12 div n_bigrams"))
  }

  /** Self-likelihood: every document scored under the model trained on
    * the whole corpus — the single-corpus "does this document look like
    * the rest" filter statistic.
    */
  def likelihood(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(df, df, idCol, textCol)

  /** DSIR-style importance weighting (Data Selection via Importance
    * Resampling, Xie et al. 2023 — public): every raw document weighted
    * by how much its hashed-bigram features look drawn from the TARGET
    * distribution rather than the raw one. Features are bigrams hashed
    * into `nBuckets` buckets (vocab-free — the hashing is what makes the
    * method run at web scale without a vocabulary build); both
    * distributions are add-one smoothed over the bucket space, and each
    * feature occurrence contributes the ratio
    *
    *   r_b = ((t_b + 1) / (tTot + B)) / ((r_b + 1) / (rTot + B))
    *
    * — target probability over raw probability of its bucket. The paper
    * sums LOG ratios; per the repo FP contract each ratio is instead
    * frozen at e6 fixed point (three correctly-rounded IEEE divisions +
    * one multiply, identical tree both engines; e6 not e12 because r_b
    * is unbounded above by rTot + B, and the headroom keeps per-doc
    * BIGINT sums safe at web scale) and documents aggregate exact
    * integer sums. avg_r_e6 > 1e6 reads as "more target-like than raw".
    *
    * Output: one row per raw doc with >= 1 bigram — (idCol, n_feats,
    * sum_r_e6, avg_r_e6). Empty TARGET voids the weighting (tTot-row
    * guard, same convention as [[scoreAgainst]]'s V > 0); an empty raw
    * corpus yields no rows naturally.
    *
    * Scale shape: two bucket-sized hash aggregates (bounded by nBuckets)
    * + one equi-join of the raw feature stream against the bucket table
    * + one-row broadcast totals. No vocabulary, no all-pairs, no window.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"need nBuckets > 0, got $nBuckets")
    def feats(df: DataFrame): DataFrame =
      bigramRows(df, idCol, textCol)
        .select(col("id"),
          (graft.functions.md5hash60(col("bigram")) % nBuckets).as("bucket"))
    val tf = feats(target)
    val rf = feats(raw)
    val tc = tf.groupBy("bucket").agg(count(lit(1)).as("t_b"))
    val rc = rf.groupBy("bucket").agg(count(lit(1)).as("r_b"))
    val tots = tf.agg(count(lit(1)).as("t_tot"))
      .crossJoin(rf.agg(count(lit(1)).as("r_tot")))
    val scored = rf
      .join(tc, Seq("bucket"), "left")
      .join(rc, Seq("bucket"))  // own bucket always present
      .crossJoin(broadcast(tots))
      .filter(col("t_tot") > 0)
      .withColumn("r_e6",
        round(lit(1.0e6) *
          (((coalesce(col("t_b"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_tot") + lit(nBuckets.toLong)).cast("double")) /
            ((col("r_b") + lit(1L)).cast("double") /
              (col("r_tot") + lit(nBuckets.toLong)).cast("double"))))
          .cast("long"))
    scored.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("r_e6")).as("sum_r_e6"))
      .withColumn("avg_r_e6", expr("sum_r_e6 div n_feats"))
  }

  /** CCNet-style domain contrast: every document scored under TWO models
    * — one trained on the in-domain slice (`inDomain` true), one on the
    * out-domain rest — and ranked by the difference. A document whose
    * transitions are likelier under the in-domain model than the
    * out-domain one reads like the target domain; delta_e12 > 0 is the
    * keep signal. Output: (idCol, n_bigrams, avg_in_e12, avg_out_e12,
    * delta_e12), one row per document scored by BOTH models (an empty
    * slice on either side voids that model and, with it, the contrast —
    * same V > 0 guard as [[scoreAgainst]]).
    *
    * ONE pass over the corpus bigram stream: both models' counts attach
    * to the same scored rows (four left joins on bigram/ctx), both
    * fixed-point probabilities compute per row, and one hash aggregate
    * emits both sums — instead of running [[scoreAgainst]] twice, which
    * would scan and shuffle the corpus-sized score side once per model.
    * The per-row p_e12 expressions are identical to [[scoreAgainst]]'s,
    * so the result (and the oracle) is unchanged.
    */
  def contrast(df: DataFrame, idCol: String, textCol: String,
               inDomain: Column): DataFrame = {
    val base = df.withColumn("__in", inDomain)
    // the flag rides the explode projection — never a corpus-sized join
    val bg = base.select(col(idCol).as("id"), col("__in"),
        explode(graft.functions.word_ngrams(toks(textCol), 2)).as("bigram"))
      .withColumn("ctx", split(col("bigram"), " ").getItem(0))
    def counts(pred: Column, cxyName: String, cxName: String) = (
      bg.filter(pred).groupBy("bigram").agg(count(lit(1)).as(cxyName)),
      bg.filter(pred).groupBy("ctx").agg(count(lit(1)).as(cxName)))
    val (cxyIn, cxIn) = counts(col("__in"), "c_xy_i", "c_x_i")
    val (cxyOut, cxOut) = counts(!col("__in"), "c_xy_o", "c_x_o")
    def vocab(pred: Column, name: String) = base.filter(pred)
      .select(explode(toks(textCol)).as("tok"))
      .agg(count_distinct(col("tok")).as(name))
    val vs = vocab(col("__in"), "v_i").crossJoin(vocab(!col("__in"), "v_o"))
    def pE12(cxy: String, cx: String, v: String): Column =
      round(lit(1.0e12) *
        ((coalesce(col(cxy), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col(cx), lit(0L)) + col(v)).cast("double"))).cast("long")
    bg
      .join(cxyIn, Seq("bigram"), "left")
      .join(cxIn, Seq("ctx"), "left")
      .join(cxyOut, Seq("bigram"), "left")
      .join(cxOut, Seq("ctx"), "left")
      .crossJoin(broadcast(vs))
      .filter(col("v_i") > 0 && col("v_o") > 0)
      .withColumn("p_i", pE12("c_xy_i", "c_x_i", "v_i"))
      .withColumn("p_o", pE12("c_xy_o", "c_x_o", "v_o"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_i")).as("__si"), sum(col("p_o")).as("__so"))
      .withColumn("avg_in_e12", expr("__si div n_bigrams"))
      .withColumn("avg_out_e12", expr("__so div n_bigrams"))
      .withColumn("delta_e12", col("avg_in_e12") - col("avg_out_e12"))
      .select(col(idCol), col("n_bigrams"), col("avg_in_e12"),
        col("avg_out_e12"), col("delta_e12"))
  }
}
