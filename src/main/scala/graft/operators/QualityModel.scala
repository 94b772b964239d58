package graft.operators

import graft.functions.md5hash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: score every document with a LINEAR model
  * over hashed bag-of-words features — the fastText-style quality
  * classifier tier of an LLM data pipeline (CCNet / GPT-3 / LLaMA all
  * gate their web crawl on one). The heuristic filters (TextOps.quality,
  * gopherRules) catch structural junk; a trained linear scorer is the
  * standard next tier, and at 100 TB its inference must run inside the
  * engine as a plan, not as an external service call per document.
  *
  * Model representation: the hashing trick (Weinberger et al.) — a token
  * maps to bucket md5hash60(token) mod numBuckets, and the model is ONE
  * bounded table (bucket, w_micro). Weights are integer micro-units so
  * scores are exact BIGINT sums, engine-reproducible and DuckDB-oracled;
  * a real trained model drops in by supplying its own weight table (same
  * schema) to [[scoreWith]].
  *
  * Scale shape — and the deliberate contrast with the per-doc-count joins
  * in NearDup (where a broadcast hint is a 100 TB liability): the weight
  * table is bounded by numBuckets REGARDLESS of corpus size, so
  * `broadcast()` here is not a hint Catalyst might outgrow — it is the
  * correct plan at any scale, turning model application into a map-side
  * hash lookup with no shuffle. Token occurrences collapse to per-doc
  * bucket multiplicities FIRST (map-side-combinable aggregate, join
  * fan-out bounded by distinct buckets per doc <= numBuckets), then the
  * broadcast lookup and one final per-doc sum.
  */
object QualityModel {

  /** Feature-space size. 4096 keeps the demo weight table obviously
    * broadcast-safe; a production model would use 2^18..2^21.
    */
  val NumBuckets = 4096

  /** Weights span [-WeightMicro, +WeightMicro] micro-units. */
  val WeightMicro = 1000000L

  /** Deterministic pseudo-trained weight table: bucket b gets
    * md5hash60("w:b") mod (2e6+1) - 1e6, an integer micro-weight in
    * [-1e6, 1e6]. Stands in for a trained model's coefficients with the
    * same distributional shape (dense, signed, bounded) while staying
    * bit-reproducible in any engine with md5 — which is what lets the
    * whole scoring pipeline be oracle-checked end to end.
    */
  def pseudoWeights(spark: SparkSession, numBuckets: Int = NumBuckets): DataFrame =
    spark.range(numBuckets).select(
      col("id").as("bucket"),
      (pmod(md5hash60(concat(lit("w:"), col("id").cast("string"))),
        lit(2 * WeightMicro + 1)) - WeightMicro).as("w_micro"))

  /** Score with the deterministic [[pseudoWeights]] model. */
  def score(df: DataFrame, idCol: String, textCol: String,
            numBuckets: Int = NumBuckets): DataFrame =
    scoreWith(df, idCol, textCol, pseudoWeights(df.sparkSession, numBuckets),
      numBuckets)

  /** Per-document linear score over hashed token features.
    *
    * Output: (idCol, n_tokens, score_micro, keep) — one row per input row
    * (token-less documents score 0), keep = score_micro >= 0. `weights`
    * must be (bucket: long, w_micro: long) with one row per bucket in
    * [0, numBuckets).
    */
  /** Demo-sized feature space for IN-ENGINE TRAINING ([[trainCentroid]]):
    * small enough that the DuckDB oracle carries the whole training
    * computation as plain CTEs. Production would use 2^18+ buckets — the
    * model stays one bounded (bucket, c1, c0) table either way.
    */
  val TrainBuckets = 64

  /** IN-ENGINE model training — closes the loop the [[scoreWith]]
    * Scaladoc points at ("a real trained model drops in"): the model
    * comes out of a Spark plan, no external trainer. The estimator is the
    * nearest-centroid text classifier (Rocchio 1971) over hashed
    * PRESENCE features, in exact fixed-point integers:
    *
    *   c1_b = (M·|{i : y_i=1, b ∈ x_i}|) div n1   (class-1 centroid)
    *   c0_b likewise over the negatives            (M = [[WeightMicro]])
    *
    * CLOSED-FORM and order-free — one posting join + one hash aggregate,
    * no iterations, deterministic on any partitioning, and every weight
    * is an integer so the DuckDB oracle hash-checks the trained model
    * itself. (A full-batch integer perceptron was tried first and
    * oscillates between the constant classifiers on this corpus — the
    * classic large-step batch failure; the closed-form estimator has no
    * step size to mistune.) Use-case shape: distill an expensive or
    * rule-based gate (blocklist hit, human labels) into a dense hashed
    * model that generalizes past the literal rule.
    *
    * Returns the model as (bucket, c1, c0) — all numBuckets rows.
    */
  def trainCentroid(df: DataFrame, idCol: String, textCol: String,
                    label: org.apache.spark.sql.Column,
                    numBuckets: Int = TrainBuckets): DataFrame = {
    val lab = labels(df, idCol, label)
    val sums = presence(df, idCol, textCol, numBuckets)
      .join(lab, "id")
      .groupBy("bucket")
      .agg(sum(col("y")).as("s1"), sum(lit(1L) - col("y")).as("s0"))
    // class sizes come to the driver anyway for the both-classes guard
    // (a centroid over zero rows is a 0-div) — reuse them as literals
    // rather than cross-joining the 1-row aggregate back in (which would
    // plan a BroadcastNestedLoopJoin; harmless at 1 row, but the repo's
    // no-BNLJ plan gate is stricter than that)
    val row = lab.agg(sum("y"), count(lit(1)) - sum("y")).first()
    val (n1, n0) = (row.getLong(0), row.getLong(1))
    require(n1 > 0 && n0 > 0,
      s"label needs both classes, got n1=$n1 n0=$n0")
    df.sparkSession.range(numBuckets).select(col("id").as("bucket"))
      .join(sums, Seq("bucket"), "left")
      .select(col("bucket"),
        expr(s"(coalesce(s1, 0) * $WeightMicro) div ${n1}L").as("c1"),
        expr(s"(coalesce(s0, 0) * $WeightMicro) div ${n0}L").as("c0"))
  }

  /** Training-set accuracy of the [[trainCentroid]] model — one
    * integer-exact audit row (n_docs, n_correct, acc_permille): the
    * number that says whether the in-engine trainer learned anything
    * before its model gates a 100 TB corpus. The nearest-centroid
    * decision ||u-c1||² <= ||u-c0||² (u = M-scaled presence vector)
    * expands to the all-integer rule
    *   Σ_{b ∈ x} 2M·(c1_b - c0_b)  >=  Σ_b (c1_b² - c0_b²)
    * — a bounded-model broadcast join + per-doc sum, the exact
    * [[scoreWith]] inference shape (absent buckets cancel into the
    * right-hand constant). On the fixture with a keyword-screen label
    * this scores ~890 permille vs the 790-permille majority class — the
    * model demonstrably learned, with both classes predicted.
    */
  def centroidEval(df: DataFrame, idCol: String, textCol: String,
                   label: org.apache.spark.sql.Column,
                   numBuckets: Int = TrainBuckets): DataFrame = {
    val cents = trainCentroid(df, idCol, textCol, label, numBuckets)
      .localCheckpoint(true)   // numBuckets rows; reused for C0 + scoring
    val thresh = cents
      .agg(sum(col("c1") * col("c1") - col("c0") * col("c0")).as("cc"))
      .first().getLong(0)
    val lhs = presence(df, idCol, textCol, numBuckets)
      .join(broadcast(cents), "bucket")
      .groupBy("id")
      .agg(sum(lit(2L * WeightMicro) * (col("c1") - col("c0"))).as("lhs"))
    labels(df, idCol, label)
      .join(lhs, Seq("id"), "left")
      .select(col("y"),
        when(coalesce(col("lhs"), lit(0L)) >= thresh, 1L).otherwise(0L)
          .as("pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === col("pred"), 1L).otherwise(0L)).as("n_correct"))
      // integral div, not `/`: Spark's long / long is double division
      // and its cast truncates where DuckDB's rounds — div avoids the
      // float entirely
      .select(col("n_docs"), col("n_correct"),
        expr("(1000 * n_correct) div n_docs").as("acc_permille"))
  }

  private def labels(df: DataFrame, idCol: String,
                     label: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol).as("id"), label.cast("long").as("y"))

  /** Distinct (id, bucket) presence postings — presence, not counts: the
    * keyword-screen concepts this trainer distills are membership
    * questions, and count features let document length dominate the
    * distance (measured: count-centroids score BELOW the majority class
    * on the same label).
    */
  private def presence(df: DataFrame, idCol: String, textCol: String,
                       numBuckets: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("token"))
      .select(col("id"),
        pmod(md5hash60(col("token")), lit(numBuckets.toLong)).as("bucket"))
      .distinct()

  def scoreWith(df: DataFrame, idCol: String, textCol: String,
                weights: DataFrame, numBuckets: Int = NumBuckets): DataFrame = {
    // occurrences, not distinct tokens: a bag-of-words model counts
    // repeats (a page of "click here subscribe now" should score as 200
    // junk tokens, not 4)
    val perBucket = df
      .select(col(idCol), explode(TextOps.tokens(lower(col(textCol)))).as("token"))
      .select(col(idCol), pmod(md5hash60(col("token")), lit(numBuckets.toLong)).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("k"))
    val scored = perBucket
      .join(broadcast(weights), "bucket")
      .groupBy(idCol)
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k") * col("w_micro")).as("score_micro"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      .withColumn("keep", col("score_micro") >= 0)
  }
}
