package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream processing over the `events` table: tumbling-window
  * aggregation, JSON property extraction, and gap-based sessionization.
  * Each has identical batch and Structured Streaming forms — the batch
  * form is the DuckDB-oracle-checkable one; EventOpsSpec runs the
  * streaming form (readStream + watermark) and asserts it produces the
  * batch result.
  *
  * Cross-engine parity notes:
  *  - the fixture's parquet timestamps are nanosecond-precision; Spark
  *    truncates to microseconds on read while DuckDB keeps ns — so queries
  *    emit INTEGER EPOCH MICROS (unix_micros vs epoch_us, both floor) and
  *    never raw timestamps;
  *  - money-like sums are integer CENTS (round(value*100) per row, then an
  *    exact integer sum) — a double sum is shuffle-order-dependent in the
  *    last ulp and would not hash-match.
  */
object EventOps {

  /** Open-session state carried between micro-batches. */
  case class SessionState(sid: Long, start: Long, end: Long, n: Long)

  /** Emitted (closed) session — same shape as the batch sessionize output. */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        session_start_us: Long, session_end_us: Long)

  /** Tumbling-window counts/sums per event_type. Window start emitted as
    * epoch micros.
    */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"),
        count_distinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value_cents"), col("n_users"))

  /** JSON property extraction (get_json_object) + per-type aggregate of the
    * numeric prop `k`.
    */
  def jsonPropAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        count(col("k")).as("n_k"))

  /** Windowed funnel: per user, the earliest completion time of each
    * stage, where stage i+1 must occur STRICTLY AFTER stage i and within
    * `maxGapUs` of it — the conversion primitive (view → click →
    * purchase) of event analytics. Returns one row per user who reached
    * stage 1, with `t<i>_us` the chosen epoch-micros per stage (null once
    * the funnel stalls) and `stage_reached`.
    *
    * Semantics: greedy-earliest per stage (t1 = user's first s1 event;
    * t_{i+1} = first s_{i+1} strictly after t_i within the gap). Greedy is
    * NOT maximal (a later s1 could enable a conversion the first one
    * misses) — it is the standard analytics convention, deterministic,
    * and O(stages) passes instead of a per-user alignment search.
    *
    * Scale shape: one filtered min-aggregate per stage, chained by
    * equi-joins on the user key — every pass shuffles only (user, t)
    * pairs for users still in the funnel (monotonically shrinking), never
    * a per-user event sort or a self-join on events. `stages` is a small
    * literal list, so the whole plan is stages-many hash aggregates.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String], maxGapUs: Long): DataFrame = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("__t"), unix_micros(col(tsCol)).as("__us"))
    var acc = base.filter(col("__t") === stages.head)
      .groupBy("user_id").agg(min(col("__us")).as("t1_us"))
    for (i <- 2 to stages.size) {
      // acc is referenced TWICE below (next-stage build + the left join) —
      // left lazy, each stage would double its whole subtree, i.e.
      // 2^stages re-scans of the events source. Materialize the
      // user-sized frame per stage (the PageRank/CC localCheckpoint
      // pattern); each stage then scans events exactly once, with the
      // stage's event_type filter pushed to the parquet scan.
      acc = acc.localCheckpoint()
      val prev = s"t${i - 1}_us"
      val next = base.filter(col("__t") === stages(i - 1))
        .join(acc.select(col("user_id"), col(prev)), "user_id")
        .filter(col("__us") > col(prev) && col("__us") <= col(prev) + maxGapUs)
        .groupBy("user_id").agg(min(col("__us")).as(s"t${i}_us"))
      acc = acc.join(next.select(col("user_id"), col(s"t${i}_us")),
        Seq("user_id"), "left")
    }
    val reached = (2 to stages.size).foldLeft(lit(1L)) { (e, i) =>
      e + when(col(s"t${i}_us").isNotNull, 1L).otherwise(0L)
    }
    // stage_reached counts the CONTIGUOUS prefix; a null at stage i forces
    // null at i+1 by construction (the join chain), so a plain sum is it
    acc.withColumn("stage_reached", reached)
  }

  /** Cohort retention matrix: users are cohorted by the WEEK of their
    * first event; for each (cohort week, week offset) the fraction of the
    * cohort active in that week — the longitudinal engagement twin of
    * [[funnel]]'s conversion view.
    *
    * Weeks are integer epoch-week indexes (floor(us / week)) — no
    * calendars, no timezones, deterministic. `retention` is ONE division
    * of two exact integers (correctly rounded IEEE — hash-comparable;
    * same argument as domainShiftTokens' ratio).
    *
    * Scale shape: a per-user min aggregate (cohort assignment), a
    * (user, week) distinct — both map-side combinable — joined on the
    * user key, then a (cohort, offset)-sized aggregate with a
    * cohort-sized join for the denominators. Everything shuffles on user
    * or on the tiny cohort grid; events are never self-joined.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                maxWeeks: Int): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // integral `div`, never `/`: the Column API's / is double division,
    // and the oracle floors in exact integer arithmetic
    val base = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .select(col(userCol).as("user_id"),
        expr(s"__us div ${weekUs}L").as("w"))
    // matrix finisher shared with the streaming path (cells -> cohorts ->
    // fractions), so the two forms cannot drift apart
    retentionFromCells(base, maxWeeks)
  }

  /** Per-user buffered funnel events carried between micro-batches:
    * (stage index, epoch micros) pairs, bounded by the user's
    * funnel-relevant events inside the active funnel window.
    */
  /** `done` = this user already EMITTED its funnel row — kept as a
    * tombstone so a later stage-1 event cannot re-open a second funnel
    * (the batch twin emits exactly one row per converting user, built
    * from the globally earliest chain). Users finalized WITHOUT a row
    * (stage 1 never fired) are removed instead: in the batch semantics a
    * later stage-1 event legitimately starts their funnel, and the
    * dropped buffer is provably unusable to it (every buffered ts is
    * below the watermark, hence below the new chain's start).
    */
  case class FunnelBuf(events: List[(Int, Long)], done: Boolean = false)

  /** Emitted (finalized) funnel row: `ts_us` is the reached-stage time
    * prefix (size == stage_reached) — the non-null prefix of the batch
    * twin's t<i>_us columns.
    */
  case class FunnelOut(user_id: Long, ts_us: Seq[Long], stage_reached: Long)

  /** The greedy-earliest funnel fold shared by [[funnelStream]]'s
    * finalization and the parity specs: returns the chosen time per
    * reached stage (empty when stage 1 never fires). Same semantics as
    * [[funnel]]'s chained min-aggregates, in-memory.
    */
  private[graft] def greedyFunnel(events: Seq[(Int, Long)], nStages: Int,
                                  maxGapUs: Long): Seq[Long] = {
    val s0 = events.collect { case (0, us) => us }
    if (s0.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer(s0.min)
    var k = 1
    var stalled = false
    while (k < nStages && !stalled) {
      val t = out.last
      val cand = events.collect {
        case (s, us) if s == k && us > t && us <= t + maxGapUs => us
      }
      if (cand.isEmpty) stalled = true
      else { out += cand.min; k += 1 }
    }
    out.toSeq
  }

  /** Streaming form of [[funnel]]: per-user state via
    * flatMapGroupsWithState with an EVENT-TIME timeout. Each batch folds
    * the user's new stage events into a buffer; the funnel FINALIZES (one
    * appended row, then a done-tombstone so the user can never emit a
    * second row — see [[FunnelBuf]]) when the watermark passes
    * t_reached + maxGap — provably the first moment the outcome is
    * immutable: any not-yet-dropped event has ts >= watermark >
    * t_reached + maxGap, which can neither extend the chain (gap
    * exceeded) nor replace an earlier stage choice (every chosen t is
    * <= t_reached < watermark, and greedy takes minima). Out-of-order
    * arrival WITHIN the watermark is therefore handled exactly: the
    * greedy fold reruns over the full buffer at finalization. Users who
    * never fire stage 1 finalize to zero rows (batch parity) once their
    * buffered events can no longer combine with any future stage-1 event
    * (same watermark argument against max buffered time).
    *
    * Emits [[FunnelOut]] — the reached-time prefix — rather than the
    * batch twin's fixed t<i>_us columns; EventOpsSpec asserts the two
    * are the same rows on a bounded fixture.
    */
  def funnelStream(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String], maxGapUs: Long,
                   watermark: String = "1 hour")
      : org.apache.spark.sql.Dataset[FunnelOut] = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val nStages = stages.size

    events
      .withWatermark(tsCol, watermark)
      .filter(col(typeCol).isin(stages: _*))
      // the watermarked ts column must SURVIVE into the stateful operator
      // (the analyzer rejects event-time timeout otherwise); it rides
      // along unused next to the extracted micros
      .select(col(userCol).cast("long"), col(typeCol), col(tsCol),
        unix_micros(col(tsCol)).as("us"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[FunnelBuf]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            val times = greedyFunnel(state.get.events, nStages, maxGapUs)
            if (times.isEmpty) { state.remove(); Iterator.empty }
            else {
              // tombstone, not remove: a later stage-1 event must not
              // re-open a second funnel for an already-emitted user
              state.update(FunnelBuf(Nil, done = true))
              Iterator(FunnelOut(uid, times, times.size.toLong))
            }
          } else if (state.getOption.exists(_.done)) {
            // already emitted: drain and ignore this user's late events
            rows.foreach(_ => ())
            Iterator.empty
          } else {
            val buf = state.getOption.map(_.events).getOrElse(Nil) ++
              rows.map(r => (stageIdx(r._2), r._4))
            state.update(FunnelBuf(buf))
            // finalize once nothing can change: reached-stage time (or the
            // max buffered time while stage 1 hasn't fired) plus the gap
            val times = greedyFunnel(buf, nStages, maxGapUs)
            val horizonUs = (if (times.nonEmpty) times.last
                             else buf.map(_._2).max) + maxGapUs
            // the timeout must sit strictly beyond the current watermark
            state.setTimeoutTimestamp(
              math.max(horizonUs / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
            Iterator.empty
          }
      }
  }

  /** Streaming half of the retention pipeline: each DISTINCT
    * (user, epoch-week) activity cell exactly once, via per-user
    * mapGroups state (the cell set is order-independent, so append-mode
    * emission needs no watermark or retraction; state per user is its
    * distinct active weeks — bounded by lifetime weeks, a few hundred for
    * years of product history). [[retentionFromCells]] turns the emitted
    * cells into the same matrix as the batch [[retention]] — asserted
    * equal in EventOpsSpec.
    */
  def activityCellsStream(events: DataFrame, userCol: String, tsCol: String)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val weekUs = 7L * 86400L * 1000000L
    events
      // same __us-then-div shape as the batch twin — and col(tsCol), not
      // a hard-coded column name (the round-8 review caught 'ts' baked in)
      .withColumn("__us", unix_micros(col(tsCol)))
      .select(col(userCol).cast("long").as("user_id"),
        expr(s"__us div ${weekUs}L").as("w"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Set[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val fresh = rows.map(_._2).toSet -- seen
          state.update(seen ++ fresh)
          fresh.iterator.map(w => (uid, w))
      }
  }

  /** Shared matrix finisher over (user_id, w) activity cells — the
    * post-cells stages of [[retention]] (cohort = min week per user,
    * offsets, exact-integer fractions), reused by the streaming path.
    * Tolerates duplicate cells (distinct inside).
    */
  def retentionFromCells(cells: DataFrame, maxWeeks: Int): DataFrame = {
    val firsts = cells.groupBy("user_id").agg(min(col("w")).as("cohort_week"))
      .localCheckpoint()
    val acts = cells.distinct()
    val per = acts.join(firsts, "user_id")
      .withColumn("week_offset", col("w") - col("cohort_week"))
      .filter(col("week_offset") >= 0 && col("week_offset") <= maxWeeks)
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_active"))
    val sizes = firsts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    per.join(sizes, "cohort_week")
      .withColumn("retention",
        col("n_active").cast("double") / col("n_cohort").cast("double"))
      .select("cohort_week", "week_offset", "n_active", "n_cohort", "retention")
  }

  /** Gap-based sessionization (batch form): a new session starts when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    * Deterministic total order inside a user via (ts, event_id).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(order: _*)
    val us = unix_micros(col("ts"))
    val prev = lag(us, 1).over(w)
    val newSession = when(prev.isNull || (us - prev) > gapMinutes * 60L * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_id",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"))
  }

  /** Streaming form of [[sessionize]]: per-user gap sessions via
    * flatMapGroupsWithState with an EVENT-TIME timeout. Within a batch,
    * events are folded in (ts, event_id) order; a session closes (and is
    * emitted, append mode) when the in-batch gap exceeds `gapMinutes` or
    * when the watermark passes lastEvent + gap (timeout path — closes
    * sessions whose user went quiet). The still-open session per user
    * stays in state, so with a bounded input the emitted set is exactly
    * the batch result minus each user's final session (asserted in
    * EventOpsSpec).
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[EventOps.SessionOut] = {
    import EventOps.{SessionOut, SessionState}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id").cast("long"), col("ts"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessionState]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.sid, s.n, s.start, s.end))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._4, r._3))
            var cur = state.getOption.orNull
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { case (_, _, _, us) =>
              if (cur == null) cur = SessionState(1L, us, us, 1L)
              else if (us - cur.end > gapUs) {
                out += SessionOut(uid, cur.sid, cur.n, cur.start, cur.end)
                cur = SessionState(cur.sid + 1, us, us, 1L)
              } else cur = cur.copy(end = us, n = cur.n + 1)
            }
            state.update(cur)
            // close by timeout once the watermark passes end-of-session+gap
            state.setTimeoutTimestamp((cur.end + gapUs) / 1000L + 1L)
            out.result().iterator
          }
      }
  }

  /** Stateful streaming (KeyValueGroupedDataset + mapGroupsWithState):
    * running per-user event counts — the custom-state shape
    * (sessionization, rate limiting, dedup-by-key all reduce to it).
    * Update-mode output; EventOpsSpec asserts the final state equals the
    * batch groupBy.
    */
  def userEventCountsStream(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (uid, rows, state) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (uid, n)
      }
  }

  /** Deterministic batch twin of [[dedupHourlyStream]]: one row per
    * (user_id, event_type, hour) with the MINIMUM event_id as the survivor
    * — dropDuplicates' arbitrary-survivor form is not oracle-comparable,
    * min() is. Emits the hour as epoch micros (parity note in the class
    * Scaladoc). The duplicate count rides along: n_events > 1 rows are
    * exactly the events a streaming dedup would have dropped.
    */
  def dedupHourly(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(min(col("event_id")).as("first_event"),
        count(lit(1)).as("n_events"))

  /** Streaming dedup with BOUNDED state: first event per
    * (user_id, event_type, hour), via dropDuplicatesWithinWatermark — keys
    * are evicted once the watermark passes, so state is O(keys per
    * watermark window), not O(all keys ever) as plain dropDuplicates would
    * be. The survivor is the first ARRIVAL (order-dependent); the batch
    * twin [[dedupHourly]] pins min(event_id) instead, so EventOpsSpec
    * asserts key-set equality, not survivor identity.
    */
  def dedupHourlyStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hr")

  /** Structured Streaming form of [[tumblingAgg]]: watermarked windowed
    * aggregation. Caller starts it with a sink (EventOpsSpec uses the
    * memory sink with processAllAvailable for a synchronous check).
    * No n_users column: streaming aggregation cannot hold exact distinct
    * state (use approx_count_distinct there if needed).
    */
  def tumblingAggStream(events: DataFrame, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value_cents"))

  /** Stream-static enrichment: attach dimension attributes to a stream by
    * key — the standard "decorate the event with what we know about the
    * user" step. A stream-static join is stateless on the stream side
    * (no watermark needed, left-outer allowed); Spark re-plans the static
    * side each micro-batch, so a dimension that lives in a table picks up
    * slowly-changing updates between batches for free. The broadcast hint
    * keeps it an executor-local hash join — at stream scale the dimension
    * must stay broadcast-sized (or be bucketed/pre-partitioned instead;
    * drop the hint and co-partition for a 10⁹-row dimension). Batch
    * equivalence is asserted in EventOpsSpec.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: pair two event streams by key where the
    * right event lands within [left.ts - before, left.ts + after] — the
    * correlation shape (click ↔ conversion, request ↔ error) that needs
    * BOTH sides buffered, unlike [[enrichStream]]'s stateless static side.
    * Both inputs are watermarked and the join condition carries the time
    * interval, which is what lets Spark bound the buffered state: a row is
    * held only until the other side's watermark passes its interval end,
    * then evicted. Without the interval bounds the state grows without
    * limit — the watermark alone is NOT enough for stream-stream joins.
    * Batch equivalence and interval edges are asserted in EventOpsSpec.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         before: String = "10 minutes",
                         after: String = "10 minutes",
                         watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("ts", watermark).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $before") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $after"))
  }
}
