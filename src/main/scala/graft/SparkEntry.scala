package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is deterministic (stable value set; row order
  * irrelevant — the driver sorts before hashing) and, where SQL-expressible,
  * has a DuckDB oracle in `oracleSql` with IDENTICAL column names.
  */
object SparkEntry {

  /** Flagship (soulutionOne.py end-to-end shape, Spark-native): dedup the
    * counterparty-like customer table, then link near-duplicate names and
    * aggregate member sets per cluster. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_dedup_exact")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- D1: key-subset distinct (soulutionOne.py:41). Key columns only,
    // so the arbitrary-survivor nondeterminism can't leak into the output.
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.lineitem(s, dir).select("l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"))),

    // ---- D3: all-column distinct (DAG/sample.py:41).
    "q_dedup_rows" -> ((s, dir) => Dedup.fullRow(Tables.lineitem(s, dir))),

    // ---- D5: before/after dedup counts (solutionFour.py:3-6).
    "q_dedup_stats" -> ((s, dir) =>
      Dedup.stats(Tables.lineitem(s, dir), Seq("l_partkey", "l_suppkey"))),

    // ---- D1 + deterministic survivor: full rows, smallest c_custkey wins.
    "q_dedup_survivor" -> ((s, dir) =>
      Dedup.canonical(Tables.customer(s, dir), Seq("c_name"), Seq(col("c_custkey")))),

    // ---- P1: surrogate id — structural check (uniqueness + count), values
    // are nondeterministic by design so they are never compared directly.
    "q_surrogate_id" -> ((s, dir) => {
      val deduped = Dedup.exact(Tables.customer(s, dir), Seq("c_name"))
      Dedup.withSurrogateId(deduped)
        .agg(count(lit(1)).as("n"), count_distinct(col("id")).as("n_ids"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
    "q_dedup_rows" ->
      "SELECT DISTINCT * FROM lineitem",
    "q_dedup_stats" ->
      ("SELECT count(*) AS n_rows, " +
        "(SELECT count(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)) AS n_distinct " +
        "FROM lineitem"),
    "q_dedup_survivor" ->
      ("SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY c_name ORDER BY c_custkey) AS rn FROM customer) " +
        "WHERE rn = 1"),
    "q_surrogate_id" ->
      "SELECT count(*) AS n, count(*) AS n_ids FROM (SELECT DISTINCT c_name FROM customer)",
  )
}
