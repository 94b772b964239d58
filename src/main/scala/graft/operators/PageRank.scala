package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality (PageRank, Page/Brin/Motwani/Winograd 1999)
  * in DETERMINISTIC integer arithmetic — the iterate-via-joins pattern a
  * Spark pipeline uses where a native engine would hand-roll a graph
  * kernel.
  *
  * Pipeline role: near-dup detection emits a PAIR GRAPH (MinHash bands,
  * winnowing fingerprints, embedding buckets — see NearDup/Winnow/Ann).
  * Centrality over that graph ranks each duplicate cluster's members by
  * how connected they are — the high-rank node is the natural canonical
  * survivor (the "most representative" copy), and rank mass per cluster
  * measures how much of the corpus is one template. Connected components
  * (ConnectedComponents.scala) says WHICH cluster; this says WHO SPEAKS
  * FOR IT.
  *
  * Why integer arithmetic: FP addition is non-associative, so a
  * double-valued rank depends on reduce order and can't be hash-compared
  * across engines (or even across two Spark runs with different
  * partitioning). Ranks here live in units of 1/SCALE: every step is
  * integer multiply/floor-divide/sum — associative, overflow-safe
  * (17 * r <= 1.7e13 << 2^63), and bit-identical on any engine, so the
  * DuckDB oracle replays the same iterations as unrolled CTEs.
  *
  * One iteration = r'(v) = floor(0.15 * SCALE / n)
  *                       + sum over in-edges u->v of floor(0.85 * r(u) / outdeg(u))
  * with 0.85 * x written as (17 * x) div 20 (exact).
  *
  * Scale design: per iteration ONE equi-join of the edge list with the
  * node-sized rank frame plus one hash aggregate on dst — linear shuffle
  * in |E|, the textbook distributed PageRank step; no driver-side state
  * except the single node count (one scalar, same bound as the CC
  * convergence signature). Caller contract: `edges` must contain every
  * node as a src at least once (true for any symmetrized/undirected pair
  * graph — each edge appears both ways), so there are no dangling nodes
  * and rank mass only leaks through floor rounding.
  */
object PageRank {

  val Scale = 1000000000000L // ranks in units of 1e-12

  /** Ranks after `iters` full iterations over the directed edge list.
    * Output: (id, outdeg, r) — r is the integer rank in units of 1/SCALE.
    * Delegates to [[ranksWeighted]] with unit weights: with w = 1 the
    * weighted degree IS the out-degree and the two formulas coincide
    * exactly (asserted in PageRankSpec).
    */
  def ranks(edges: DataFrame, src: String, dst: String, iters: Int): DataFrame =
    ranksWeighted(edges.withColumn("__unit_w", lit(1L)), src, dst, "__unit_w", iters)

  /** Edge-WEIGHTED ranks: a neighbor's mass is split proportionally to
    * edge weight — floor(0.85 * r(u) * w(u,v) / W(u)) with W(u) the sum of
    * u's out-edge weights — the natural form for a similarity graph,
    * where a 0.95-Jaccard twin should pull harder than a borderline
    * match. `outdeg` in the output is the WEIGHTED degree W. Same
    * deterministic-integer argument as the Scaladoc above; overflow needs
    * 17 * r * w < 2^63, i.e. per-edge integer weights up to ~5*10^5 at
    * SCALE = 1e12 (caller contract — similarity weights like shared-
    * fingerprint counts sit far below it).
    */
  def ranksWeighted(edges: DataFrame, src: String, dst: String,
                    weightCol: String, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // The edge list is referenced once per iteration (plus the degree
    // build) — left lazy, an expensive upstream (e.g. the winnowing
    // fingerprint join that produced the pairs) would be recomputed for
    // EVERY reference in the final DAG. Materialize it once; same
    // localCheckpoint pattern as the CC rounds (ConnectedComponents).
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"),
        col(weightCol).cast("long").as("__w"))
      .localCheckpoint()
    val deg = e.groupBy(col("__src").as("id"))
      .agg(sum(col("__w")).as("outdeg"))
      .localCheckpoint() // node-sized; referenced every iteration
    // one scalar to the driver (node count) — bounded by construction
    val n = deg.count()
    // empty graph (e.g. a corpus with no near-dup pairs) → empty result,
    // same schema — a pipeline stage, not an error
    if (n == 0) return deg.select(col("id"), col("outdeg"), lit(0L).as("r"))
    var r = deg.select(col("id"), col("outdeg"), lit(Scale / n).as("r"))
    val base = (3L * Scale / 20L) / n // floor(0.15 * SCALE / n)
    for (i <- 1 to iters) {
      val contrib = e
        .join(r.withColumnRenamed("id", "__src"), "__src")
        .select(col("__dst").as("id"),
          expr("(17 * r * __w) div (20 * outdeg)").as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      r = deg.join(contrib, Seq("id"))
        .select(col("id"), col("outdeg"), (lit(base) + col("in_mass")).as("r"))
      // truncate lineage so iteration i's plan doesn't embed i-1 joins
      // (node-sized materialization — the CC per-round pattern)
      if (i < iters) r = r.localCheckpoint()
    }
    r
  }

  /** PERSONALIZED ranks: the teleport mass returns to a seed set instead
    * of spreading uniformly — rank becomes graph PROXIMITY TO THE SEEDS
    * (find documents similar-by-graph to these known-good/known-bad ones:
    * expand a curated allowlist through the near-dup graph, chase a
    * contamination cluster outward from confirmed leaks). Non-seed nodes
    * hold rank only by being close to seeds.
    *
    * Same deterministic integer arithmetic and per-iteration shape as
    * [[ranksWeighted]]; the only changes are the start vector (mass
    * SCALE/|seeds| on each seed, 0 elsewhere) and the restart term
    * (floor(0.15*SCALE/|seeds|) added to seeds only). `seeds` is the
    * caller's query set — driver-side by construction, bounded like a
    * query vector; it is broadcast-joined as a literal frame.
    */
  def ranksPersonalized(edges: DataFrame, src: String, dst: String,
                        weightCol: String, seeds: Seq[Long],
                        iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(seeds.nonEmpty, "personalized PageRank needs a non-empty seed set")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"),
        col(weightCol).cast("long").as("__w"))
      .localCheckpoint()
    val deg = e.groupBy(col("__src").as("id"))
      .agg(sum(col("__w")).as("outdeg"))
      .localCheckpoint()
    if (deg.isEmpty) return deg.select(col("id"), col("outdeg"), lit(0L).as("r"))
    val seedDf = seeds.distinct.toDF("id").withColumn("__seed", lit(true))
    val nS = seeds.distinct.size
    val base = (3L * Scale / 20L) / nS
    val withSeed = deg.join(broadcast(seedDf), Seq("id"), "left")
      .select(col("id"), col("outdeg"),
        coalesce(col("__seed"), lit(false)).as("__is_seed"))
      .localCheckpoint()
    var r = withSeed.select(col("id"), col("outdeg"),
      when(col("__is_seed"), lit(Scale / nS)).otherwise(lit(0L)).as("r"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(r.withColumnRenamed("id", "__src"), "__src")
        .select(col("__dst").as("id"),
          expr("(17 * r * __w) div (20 * outdeg)").as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      r = withSeed.join(contrib, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (when(col("__is_seed"), lit(base)).otherwise(lit(0L)) +
            coalesce(col("in_mass"), lit(0L))).as("r"))
      if (i < iters) r = r.localCheckpoint()
    }
    r
  }

  /** Symmetrize an undirected pair list (id_a, id_b) into a directed edge
    * list (src, dst) with each pair in both directions; extra columns
    * (e.g. an edge weight) ride along.
    */
  def symmetrize(pairs: DataFrame, a: String, b: String): DataFrame = {
    val rest = pairs.columns.filterNot(c => c == a || c == b).map(col).toSeq
    pairs.select(col(a).as("src") +: col(b).as("dst") +: rest: _*)
      .unionByName(pairs.select(col(b).as("src") +: col(a).as("dst") +: rest: _*))
  }
}
