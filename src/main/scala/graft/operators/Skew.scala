package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators (100 TB posture). AQE's skew-join
  * split and the doc-frequency guards in [[NearDup]]/[[Winnow]] cover the
  * join side; this covers the AGGREGATION side, where a hot group key
  * funnels one reducer.
  *
  * The problem case is distinct-style aggregation: plain `count_distinct`
  * cannot map-side combine (every distinct value must reach the reducer
  * owning its group), so one hot key — a bot user, an empty-string
  * default, a boilerplate fingerprint — ships ALL of its values to one
  * task. Salting splits each group into `salts` sub-groups BY VALUE HASH,
  * so distinct work spreads over `salts` reducers and the final
  * recombination is a tiny exact merge (value-hash partitioning means a
  * value appears in exactly one sub-group — partial distinct counts are
  * disjoint and SUM to the exact answer).
  */
object Skew {

  /** Exact per-key distinct-value counts with two-stage salted
    * aggregation: stage 1 groups by (key, hash(value) mod salts) and
    * counts distinct within the sub-group (parallel across `salts` tasks
    * even for one hot key); stage 2 sums the disjoint partials per key.
    * Result is EXACTLY `groupBy(key).agg(count_distinct(value))` for any
    * salts >= 1 (null values are excluded, matching count_distinct).
    */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
                          salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    df.select(col(keyCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), pmod(xxhash64(col(valueCol)), lit(salts.toLong)).as("__salt"))
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n_distinct"))
  }

  /** Skew-safe inner equi-join for the large-×-large case where the build
    * side is too big to broadcast and the probe side's join key is skewed
    * (a handful of hot keys funnel whole shuffle partitions into single
    * tasks — the sort-merge path AQE can split, but the shuffle_hash path
    * it cannot). Each build row is replicated `salts` times with a salt
    * tag; each probe row picks ONE salt deterministically (hash of the
    * whole row, so a hot key's rows spread across all `salts` reducers);
    * the join runs on (key, salt). Result is EXACTLY the plain inner join
    * for any salts >= 1: every probe row meets every matching build row
    * exactly once (the build copy carrying its salt), and identical probe
    * rows landing on one salt is a spreading loss, not a correctness one.
    *
    * Cost model: build side shuffles `salts`× its size — the standard
    * trade, sized for build << probe (dimension-vs-fact with a hot fact
    * key). `keys` columns must exist on both sides.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val expandedBuild = build.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    // hint on the BUILD side: the hinted side is the hash-build side, and
    // this operator is sized for build << probe — building over the fact
    // side would OOM exactly where the salting is needed
    saltedProbe
      .join(expandedBuild.hint("shuffle_hash"), keys :+ "__salt")
      .drop("__salt")
  }

  /** Left join where null-keyed left rows BYPASS the join: SQL equi-join
    * semantics already guarantee a null key matches nothing, but Spark
    * still ships every null-keyed row through the shuffle into one
    * partition (hash(null) is one value) — the single most common skew
    * accident in practice, because real corpora are full of
    * not-yet-attributed rows (events before login, docs without a source).
    * Splitting them off is free (same scan), they keep their left-join
    * null padding, and the shuffle only carries rows that can match.
    * Result is EXACTLY `left.join(right, Seq(key), "left")`.
    */
  def nullTolerantLeftJoin(left: DataFrame, right: DataFrame,
                           key: String): DataFrame = {
    val joined = left.filter(col(key).isNotNull).join(right, Seq(key), "left")
    val rightPad = right.schema.fields.filterNot(_.name == key)
      .map(f => lit(null).cast(f.dataType).as(f.name))
    val bypass = left.filter(col(key).isNull)
      .select(left.columns.map(col) ++ rightPad: _*)
    joined.unionByName(bypass)
  }
}
