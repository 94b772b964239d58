package graft.operators

import graft.functions.md5hash60
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing (north-star scope: every
  * LLM pipeline downsamples/upweights corpus strata — by language, source,
  * quality band — and the sample must be REPRODUCIBLE across reruns and
  * engines, which `rand()` is not).
  *
  * Both operators key the decision on [[md5hash60]] of the row id — a pure
  * engine-portable function of the data, so the same row is selected on
  * every run, on any cluster layout, and in the DuckDB oracle.
  */
object Sampling {

  /** Hash-threshold sample: keeps rows with md5hash60(id) mod 1000 <
    * perMille. A PURE PROJECTION + FILTER — no shuffle, no state,
    * scan-speed at 100 TB, and composable (sampling by 200‰ then 500‰
    * selects a nested 100‰ subset only if seeds differ — pass `seed` to
    * decorrelate stages). Expected fraction perMille/1000 per stratum;
    * exact size is binomial, which is what production pipelines accept in
    * exchange for never shuffling.
    */
  def hashSample(df: DataFrame, idCol: String, perMille: Int,
                 seed: Int = 0): DataFrame =
    df.filter(pmod(md5hash60(col(idCol).cast("string"), seed), lit(1000L)) < perMille)

  /** Deterministic train/val/test assignment: md5hash60(id) mod 100 into
    * [0,trainPct) → train, [trainPct, trainPct+valPct) → val, rest →
    * test. The properties every split needs, by construction: pure
    * projection (no shuffle, no state, reproducible across runs and
    * engines — the DuckDB oracle replays the same md5 arithmetic),
    * stable under corpus growth (a doc's split never changes when other
    * docs arrive), and decorrelatable from sampling stages via `seed`.
    */
  def splitAssign(df: DataFrame, idCol: String, trainPct: Int = 80,
                  valPct: Int = 10, seed: Int = 0): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"bad split: train=$trainPct val=$valPct")
    val bucket = pmod(md5hash60(col(idCol).cast("string"), seed), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Leakage-free train/val/test split: assign the split by the near-dup
    * CLUSTER, not the document — every member of a duplicate family lands
    * in the same split, so no near-copy of a training doc leaks into eval
    * (the contamination mode document-level splitting cannot prevent:
    * near-identical docs hash to independent buckets). Takes the
    * (id, component) frame a dedup tier already produces (e.g.
    * [[NearDup.dedupByNearDup]]) and keys [[splitAssign]]'s md5 bucket on
    * the component id — inheriting all its properties (pure projection on
    * top of the cluster frame, engine-reproducible, stable under corpus
    * growth as long as components keep their canonical min-id).
    */
  def leakFreeSplit(clusters: DataFrame, idCol: String,
                    componentCol: String = "component", trainPct: Int = 80,
                    valPct: Int = 10, seed: Int = 0): DataFrame =
    splitAssign(clusters, componentCol, trainPct, valPct, seed)
      .select(col(idCol), col(componentCol), col("split"))

  /** Count-once soft dedup: instead of DROPPING duplicates, weight every
    * doc by the inverse of its near-dup cluster size (w_micro =
    * 1e6 div cluster_size) so each duplicate FAMILY contributes one
    * expected document to the sample regardless of how many copies exist
    * — the soft alternative to canonical-survivor dedup when copies carry
    * signal (popularity, independent provenance) that hard dedup throws
    * away. Feed the output to [[weightedSample]]; a singleton keeps
    * weight 1e6 and always survives, an f-way family survives with
    * expectation f·(1/f) = 1. One count aggregate + a component-keyed
    * join on top of the cluster frame.
    */
  def softDedupWeights(clusters: DataFrame, idCol: String,
                       componentCol: String = "component"): DataFrame = {
    val sizes = clusters.groupBy(componentCol)
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, componentCol)
      .select(col(idCol), col(componentCol), col("cluster_size"),
        expr("1000000 div cluster_size").as("w_micro"))
  }

  /** Source-mix rebalancing — the data-mixing step of an LLM pipeline:
    * down-sample over-represented strata so every stratum contributes
    * (approximately) the size of the SMALLEST one. Two passes, both
    * scale-flat: a per-stratum count aggregate (rows = #strata, broadcast
    * back), then the same hash-threshold filter as [[hashSample]] with a
    * per-stratum keep rate of floor(1000·min/count) per-mille. All-integer
    * rate arithmetic + md5 thresholds keep the selected set deterministic
    * and engine-reproducible (oracled end-to-end, q_rebalance_mix);
    * within-stratum selection stays unbiased because the hash is
    * independent of any ordering. Target shares beyond "equalize" are a
    * caller-side tweak of the rate expression.
    */
  def rebalanceMix(df: DataFrame, strataCol: String, idCol: String,
                   seed: Int = 0): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minN = min(col("__n")).over(org.apache.spark.sql.expressions.Window
      .partitionBy())   // global min over the tiny counts frame only
    // `div` (integral division), never `/`: double division + cast could
    // round differently from the oracle's integer arithmetic.
    val rates = counts.withColumn("__min", minN)
      .withColumn("__rate", expr("(1000 * __min) div __n"))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(pmod(md5hash60(col(idCol).cast("string"), seed), lit(1000L)) <
        col("__rate"))
      .drop("__rate")
  }

  /** Temperature-based stratum rebalance — the multilingual data-mixing
    * recipe (sample stratum i with probability ∝ share_i^α, α < 1, so
    * big strata are damped but not flattened; α=0 is [[rebalanceMix]]'s
    * full equalize, α=1 is no-op proportional). This operator fixes
    * α = 1/2: per-stratum keep-rate = floor(1000·sqrt(n_min/n_i)) per
    * mille — the smallest stratum keeps everything, a stratum 100x larger
    * keeps 10x the smallest's row count instead of 1x (equalize) or 100x
    * (raw). α=1/2 specifically because the rate then needs only division
    * and sqrt, BOTH correctly-rounded IEEE-754 operations — bit-identical
    * in any engine, so the selected set stays oracle-checkable. A general
    * α needs pow(), whose cross-engine rounding is NOT guaranteed; that
    * variant belongs behind a tolerance check, not a hash gate (the
    * documented reason it is absent).
    *
    * Same two scale-flat passes as [[rebalanceMix]]: stratum counts
    * (broadcast back), then the shuffle-free hash-threshold filter.
    */
  def temperatureRebalance(df: DataFrame, strataCol: String, idCol: String,
                           seed: Int = 0): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minN = min(col("__n")).over(org.apache.spark.sql.expressions.Window
      .partitionBy())   // global min over the tiny counts frame only
    val rates = counts.withColumn("__min", minN)
      .withColumn("__rate",
        floor(lit(1000.0) * sqrt(col("__min").cast("double") /
          col("__n").cast("double"))).cast("long"))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(pmod(md5hash60(col(idCol).cast("string"), seed), lit(1000L)) <
        col("__rate"))
      .drop("__rate")
  }

  /** Per-ROW-probability sample — the quality-weighted keep step of a
    * data-mixing pipeline (keep high-quality documents with probability
    * ~1, boilerplate with probability ~0.1, rather than one rate per
    * stratum as in [[rebalanceMix]]). `weightMicroCol` holds the keep
    * probability in integer micro-units [0, 1e6]: a row survives iff
    * md5hash60(id) mod 1e6 < weight. Same properties as [[hashSample]]:
    * pure projection + filter (no shuffle, scan-speed at 100 TB),
    * reproducible across runs/engines, per-row expected inclusion exactly
    * weight/1e6, decorrelatable from other stages via `seed`. Integer
    * weights, never doubles: the threshold compare must be bit-identical
    * in the oracle.
    */
  def weightedSample(df: DataFrame, idCol: String, weightMicroCol: String,
                     seed: Int = 0): DataFrame =
    df.filter(pmod(md5hash60(col(idCol).cast("string"), seed), lit(1000000L)) <
      col(weightMicroCol))

  /** Stratified EXACT-quota sample: per stratum, the `quota` rows with the
    * smallest (hash, id) — a deterministic reservoir. Needs one shuffle on
    * the stratum key plus a bounded per-stratum sort; strata counts are
    * usually few and fat, so AQE's skew split keeps partitions balanced.
    * When exactness is not required, [[hashSample]] is the cheaper path.
    */
  def stratifiedQuota(df: DataFrame, strataCol: String, idCol: String,
                      quota: Int, seed: Int = 0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5hash60(col(idCol).cast("string"), seed), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= quota)
  }

  /** Deterministic global training order: every row gets a dense
    * `shuffle_rank` (1..n) in hash-of-id order — the epoch shuffle of a
    * training pipeline as a REPRODUCIBLE property of the data (any engine,
    * any cluster layout, any rerun emits the identical permutation; a new
    * seed is a fresh independent shuffle). rand()-based shuffles lose
    * exactly this.
    *
    * Scale shape: ordering by the hash IS the shuffle, so the only cost is
    * one range-partitioned sort; the dense rank comes from
    * [[PrefixSum.runningTotal]]'s two-phase scan (per-partition ranks +
    * numPartitions offsets through the driver), NEVER a global
    * `row_number() OVER (ORDER BY ...)` window — that plans every row into
    * ONE task. The sort key is the zero-padded (hash, id) string: unique
    * by construction (ids unique — caller contract, ids non-negative), so
    * the rank is total and the prefix-sum uniqueness contract holds.
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Int = 0): DataFrame = {
    val key = concat(
      lpad(md5hash60(col(idCol).cast("string"), seed).cast("string"), 19, "0"),
      lit("-"), lpad(col(idCol).cast("string"), 19, "0"))
    PrefixSum.runningTotal(
      df.withColumn("__sk", key).withColumn("__one", lit(1L)), "__sk", "__one")
      .withColumnRenamed("cum___one", "shuffle_rank")
      .drop("__sk", "__one")
  }

  /** Epoch upsampling — the REPEAT side of data mixing, where
    * [[rebalanceMix]]/[[temperatureRebalance]] are the down-sample side:
    * materialize per-stratum repeat factors (e.g. low-resource languages
    * seen 4 epochs per training pass, the dominant one once) as one row
    * per (document, epoch). Each row gains an `epoch` column in
    * [1, repeats(stratum)]; unknown strata default to 1 epoch.
    *
    * Pure projection + generator (`explode(sequence(...))` — codegen'd,
    * no shuffle, no state): output size is exactly sum(n_i * r_i) by
    * construction, the scan-speed shape. The repeat map is a LITERAL
    * (caller-side mixing config, a handful of strata), not a joined
    * table — so there is nothing to broadcast and nothing data-dependent
    * in the plan. Downstream packing/sharding sees epoch as an ordinary
    * column (mix different epochs into different shards via
    * hash(id, epoch)).
    */
  def epochRepeat(df: DataFrame, strataCol: String,
                  repeats: Map[String, Int]): DataFrame = {
    // >= 1, not 0: sequence(1, 0) infers a NEGATIVE step and yields
    // [1, 0] — two phantom epochs. Dropping a stratum is a filter's job.
    require(repeats.values.forall(r => r >= 1 && r <= 1000),
      s"repeat factors must be in [1,1000]: $repeats")
    val rep = repeats.foldLeft(lit(1)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("epoch", explode(sequence(lit(1), rep)))
  }

  /** Token-budget corpus selection: per stratum, take documents in
    * (quality desc, id) order until the stratum's cumulative token count
    * would exceed `budgetTokens` — the greedy fill that assembles a
    * training mix against a token budget ("the best B tokens per source"),
    * the step after scoring and before packing. Inclusive-cum semantics:
    * a document is kept iff its own tokens still fit (no overflow doc),
    * so the selection is exact and deterministic given the (quality, id)
    * tie-break.
    *
    * Scale shape: the cumulative count uses [[PrefixSum.runningTotalBy]]'s
    * range-partitioned two-phase scan, NOT a `PARTITION BY stratum`
    * window — a plain per-stratum window caps parallelism at the stratum
    * count (20 sources = 20 tasks at any cluster size) and funnels a
    * dominant stratum into one task; the grouped prefix sum keeps every
    * core busy and a fat stratum just spans contiguous range partitions.
    *
    * Input df must carry idCol, strataCol, qualityCol (numeric),
    * tokensCol (integral). Output: input columns + cum_tokens, filtered
    * to the selected set.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, strataCol: String,
                        qualityCol: String, tokensCol: String,
                        budgetTokens: Long): DataFrame = {
    val base = df.withColumn("__negq", -col(qualityCol))
    PrefixSum.runningTotalBy(base, strataCol, Seq("__negq", idCol), tokensCol)
      .filter(col(s"cum_$tokensCol") <= budgetTokens)
      .withColumnRenamed(s"cum_$tokensCol", "cum_tokens")
      .drop("__negq")
  }
}
