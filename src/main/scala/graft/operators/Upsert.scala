package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed merge (MERGE INTO semantics without a table format): apply a
  * change batch to a standing corpus snapshot. The incremental shape every
  * training-data pipeline ends up with — yesterday's curated corpus plus
  * today's corrections/deletions — re-expressed as plain DataFrame joins
  * so it works on any sink Spark can write.
  *
  * Scale design: the standing corpus is the 100 TB side. Both operators
  * touch the corpus with exactly ONE left-anti join against the distinct
  * change keys — the corpus is never shuffled on its own size, never
  * windowed, and matched rows are replaced wholesale (no per-column
  * coalesce pass). The change-key side carries NO forced broadcast hint:
  * a typical CDC batch is small and AQE broadcasts it at runtime from its
  * measured size, but a backfill batch touching a huge key range is NOT
  * construction-bounded, and a forced hint would make it a driver-side
  * build that OOMs — exactly the failure mode AQE's threshold check
  * exists to avoid (it falls back to a shuffled anti-join).
  *
  * Reference anchor: the reference's pipelines rebuild their MySQL target
  * from scratch per run (`/root/reference/DAG/sample.py:71-87` truncate +
  * reload); these operators are the incremental counterpart a 100 TB
  * corpus needs — full rewrites stop being an option long before that.
  */
object Upsert {

  /** Upsert: rows of `updates` replace same-key rows of `current`; keys
    * only in `updates` are inserts; everything else passes through.
    * `updates` must hold one row per key (caller contract — enforceable
    * upstream with [[Dedup.canonical]]).
    */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val changeKeys = updates.select(keys.map(col): _*).distinct()
    updates.unionByName(current.join(changeKeys, keys, "left_anti"))
  }

  /** CDC apply: `changes` carries an op column — `"u"` rows upsert,
    * `"d"` rows delete their key. One change row per key (caller
    * contract). Result = upserted rows ∪ corpus rows whose key saw no
    * change at all; deleted keys vanish by falling out of both branches.
    */
  def applyCdc(current: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String): DataFrame = {
    val changeKeys = changes.select(keys.map(col): _*).distinct()
    val upserts = changes.filter(col(opCol) === "u").drop(opCol)
    upserts.unionByName(current.join(changeKeys, keys, "left_anti"))
  }

  /** Structured-Streaming twin of [[applyCdc]]: a continuously maintained
    * keyed materialization of a CDC change log via
    * `flatMapGroupsWithState`. Input columns: `k` (key), `seq` (the
    * change-log LSN — total order per key), `v` (payload), `op`
    * ("u" upsert / "d" delete). Each micro-batch folds a key's changes in
    * seq order into per-key state and emits one update row
    * (k, last_seq, v = None when deleted) — Update output mode; the
    * downstream sink keeps each key's latest row (the UpsertSpec parity
    * test reconstructs exactly that and matches it against the batch
    * [[applyCdc]] fold).
    *
    * Replay-safe: a change at or below the key's folded `last_seq` is a
    * no-op, so at-least-once upstream delivery cannot corrupt state (the
    * reason deletes keep a tombstone entry instead of removing state —
    * `state.remove()` would forget last_seq and let a late stale upsert
    * resurrect the key).
    *
    * Scale: state is one small tuple per LIVE key (plus tombstones),
    * partitioned by key across executors — the bounded-state shape;
    * production retires cold tombstones with a state TTL/timeout, elided
    * here to keep replay protection unconditional.
    */
  def cdcApplyStream(changes: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Option[Long])] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = changes.sparkSession
    import spark.implicits._
    changes.select(col("k").cast("long"), col("seq").cast("long"),
        col("v").cast("long"), col("op").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Boolean), (Long, Long, Option[Long])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        // state = (lastSeq, value, exists)
        (k: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, Boolean)]) =>
          var (lastSeq, v, exists) =
            state.getOption.getOrElse((Long.MinValue, 0L, false))
          it.toSeq.sortBy(_._2).foreach { case (_, seq, value, op) =>
            if (seq > lastSeq) {
              lastSeq = seq
              if (op == "u") { v = value; exists = true } else exists = false
            }
          }
          state.update((lastSeq, v, exists))
          Iterator.single((k, lastSeq, if (exists) Some(v) else None))
      }
  }

  /** Snapshot diff: per-key churn between two corpus snapshots of the same
    * schema — `added` (key only in `cur`), `removed` (only in `prev`),
    * `changed` (present in both, any non-key column differs, null-safe).
    * Unchanged keys are dropped, so the OUTPUT is only the churn — the
    * property that makes this usable at 100 TB, where two snapshots are
    * huge but their delta is small (audit a rebuild, derive a CDC batch
    * for [[applyCdc]], alert on unexpected mass-deletes).
    *
    * One full-outer shuffle join on the key — both sides partition once,
    * payload comparison is a null-safe struct equality evaluated in place
    * (no hashing round-trip, no second pass). Keys must be non-null on
    * both sides (null keys would full-outer-mismatch into added+removed).
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keys: Seq[String]): DataFrame = {
    require(prev.columns.sameElements(cur.columns),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs ${cur.columns.mkString(",")}")
    val payload = prev.columns.filterNot(keys.contains).toSeq
    val keyCond = keys.map(k => col(s"p.$k") === col(s"c.$k")).reduce(_ && _)
    val pPay = struct(payload.map(f => col(s"p.$f")): _*)
    val cPay = struct(payload.map(f => col(s"c.$f")): _*)
    prev.as("p").join(cur.as("c"), keyCond, "full_outer")
      .withColumn("change",
        when(col(s"p.${keys.head}").isNull, lit("added"))
          .when(col(s"c.${keys.head}").isNull, lit("removed"))
          .when(pPay <=> cPay, lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(k => coalesce(col(s"p.$k"), col(s"c.$k")).as(k)) :+ col("change"): _*)
  }
}
