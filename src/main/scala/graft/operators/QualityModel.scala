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
