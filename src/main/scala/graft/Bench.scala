package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query (or the subset named in
  * args) against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Timing policy: the sandbox showed up to 7x wall-time swings for the
  * same query across back-to-back identical runs, so each query executes
  * SPARK_GRAFT_BENCH_RUNS times (default 2) and reports the MINIMUM —
  * the min is the least-noisy estimator of the query's true cost under
  * external interference. All attempts are published in "runs" so the
  * spread itself is visible to the driver.
  *
  * SERVE-ONLY rows (q_cluster_cc_serve / q_cluster_cc_republish)
  * amortize their standing publish across attempts via
  * SparkEntry.cachedPublish, so their MIN prices the serve alone only
  * once a post-publish attempt has run. The scheduler GUARANTEES that
  * attempt ([[shouldAttemptAgain]]): an attempt that built its standing
  * publish always earns a follow-up, overriding both the repeat cutoff
  * (round-15: the publish-laden first attempt hit 61 s on a hot box,
  * tripped the 60 s cutoff, and the row recorded a phantom 10x vs its
  * serve-priced baseline) and SPARK_GRAFT_BENCH_RUNS=1 (the budget
  * counts priced attempts; a publish-laden attempt is not a valid
  * price). The artifact's `publish_attempts` field records which
  * attempt indices built a publish. Full contract: OPERATIONS.md
  * "Serve-pricing convention".
  */
object Bench {

  /** Attempt-scheduling decision, pure so BenchSchedulingSpec can pin it
    * without a SparkSession. The budget counts PRICED attempts —
    * attempts that did not build a standing publish — so a serve row
    * gets the same min-of-nRuns noise robustness as every other row
    * (its publish-laden first attempt is not a valid price and does not
    * consume budget). Rules, in order:
    *
    *  - attempt 0 always runs;
    *  - an attempt that BUILT a standing publish (cachedPublish body
    *    executed inside it) always earns a follow-up attempt, regardless
    *    of the repeat cutoff AND of the budget: its wall time priced
    *    publish+serve, which is not the row's price, so the row still
    *    owes its serve-priced attempts (round-15: the cutoff silently
    *    denied it and q_cluster_cc_serve recorded a 10x phantom). The
    *    exemption is bounded at nRuns+1 TOTAL attempts so a POISONED
    *    publish (body throwing every call, hence rebuilding every call)
    *    cannot loop forever;
    *  - otherwise, repeat while the PRICED-attempt budget has room and
    *    the last attempt finished under the cutoff — past it, the
    *    measurement is signal and a repeat just re-pays minutes on the
    *    20-40x slower official host.
    */
  private[graft] def shouldAttemptAgain(attemptsSoFar: Int,
      publishAttemptsSoFar: Int, nRuns: Int,
      lastWallSec: Double, lastBuiltPublish: Boolean,
      cutoffSec: Double): Boolean =
    if (attemptsSoFar == 0) true
    else if (lastBuiltPublish) attemptsSoFar <= nRuns.max(1)
    else (attemptsSoFar - publishAttemptsSoFar) < nRuns &&
      lastWallSec <= cutoffSec

  /** Per-entry window count from the baseline's provenance map — a real
    * JSON read (Jackson rides in Spark's jars), not a positional grep:
    * the first cut keyed this on freeze_baseline.py's (frozen_s,
    * n_windows) key-order convention, a three-component ordering
    * contract a hand edit could silently break (round-18 review); an
    * order-independent parse deletes the contract. Returns empty on any
    * malformed/absent provenance — window counts are annotation, never
    * a gate.
    */
  private[graft] def parseBaselineWindows(txt: String): Map[String, Int] =
    try {
      import scala.jdk.CollectionConverters._
      val prov = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(txt).get("provenance")
      if (prov == null || !prov.isObject) Map.empty
      else prov.properties().asScala
        .flatMap { e =>
          Option(e.getValue.get("n_windows"))
            .map(n => e.getKey -> n.asInt())
        }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Recheck-eligibility classification of one finished row, pure for
    * the spec. `Eligible` rows re-run after the suite; `OverCutoff`
    * rows are inflated vs baseline but too big to re-run — they must be
    * SURFACED in the artifact's `over_cutoff` field rather than
    * silently dropped (round-15: the rows most in need of a second look
    * were the only ones that couldn't get one, invisibly). `Clean`
    * covers everything else: no baseline, failed attempts, in band.
    */
  private[graft] sealed trait RecheckClass
  private[graft] case object RecheckEligible extends RecheckClass
  private[graft] case object RecheckOverCutoff extends RecheckClass
  private[graft] case object RecheckClean extends RecheckClass
  private[graft] def recheckClass(minSec: Double, baselineSec: Option[Double],
      noiseFactor: Double, cutoffSec: Double, failed: Boolean): RecheckClass =
    baselineSec match {
      case Some(b) if !failed && minSec > noiseFactor * b =>
        if (minSec <= cutoffSec) RecheckEligible else RecheckOverCutoff
      case _ => RecheckClean
    }

  /** Whether the query at main-pass position `pos` (0-based suite order)
    * ran inside a HOT calibration bracket — pure for the spec. `series`
    * is the window's calibration ticks as (afterQueries, seconds): the
    * start probe at position 0, a mid-window tick every N queries
    * (round-17 item 4: the r16 driver window's loadavg rose 4.55→11.55
    * while the two-point calibration read flat 0.305/0.295 — the heat
    * landed BETWEEN the endpoints, invisible), and the end probe at
    * position nQueries. A query is bracketed by the last tick at or
    * before its position and the first tick after it; the bracket is
    * hot when either bounding tick exceeds `hotFactor` × the window's
    * QUIETEST tick (the window's own baseline — an absolute threshold
    * would mistake a slow host for a hot one). Suspects whose brackets
    * were hot carry the attribution in the artifact
    * (`suspect_hot_bracket`) so a driver diff separates "box was hot
    * right there" from "code got slower" without a manual re-measure.
    */
  private[graft] def bracketIsHot(series: Seq[(Int, Double)], pos: Int,
                                  hotFactor: Double): Boolean =
    if (series.size < 2) false
    else {
      val sorted = series.sortBy(_._1)
      val quiet = sorted.map(_._2).min
      val before = sorted.filter(_._1 <= pos).lastOption.map(_._2)
      val after = sorted.find(_._1 > pos).map(_._2)
      (before.toSeq ++ after.toSeq).exists(_ > hotFactor * quiet)
    }

  /** Stage-level profile of every bench attempt, bucketed by the
    * per-attempt job group (`<query>#<attemptIdx>`). Round-14 verdict:
    * two rounds of quiet-window re-measures of q_cluster_cc_incremental
    * failed to transfer to the driver's full-suite window, so the
    * evidence has to come from INSIDE the suite — this listener captures
    * the per-stage run/cpu/GC/shuffle/spill split of the inflated
    * attempt itself, and the post-suite recheck attempts of the same row
    * land in the same dump for a like-for-like comparison. Listener cost
    * is a map insert per stage — noise against any query's own work.
    */
  private final class StageProfiler extends SparkListener {
    final case class StageRow(group: String, stageId: Int, name: String,
      durMs: Long, tasks: Int, runMs: Long, cpuMs: Long, gcMs: Long,
      inMb: Double, shReadMb: Double, shWriteMb: Double, spillMb: Double)
    private val stageGroup = scala.collection.mutable.Map.empty[Int, String]
    private val jobsPerGroup = scala.collection.mutable.Map.empty[String, Int]
    private val rows = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      val g = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .getOrElse("(none)")
      jobsPerGroup(g) = jobsPerGroup.getOrElse(g, 0) + 1
      j.stageIds.foreach(id => stageGroup(id) = g)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        val i = s.stageInfo
        val g = stageGroup.getOrElse(i.stageId, "(none)")
        val dur = (for (a <- i.submissionTime; b <- i.completionTime)
          yield b - a).getOrElse(0L)
        val m = i.taskMetrics
        if (m != null) rows += StageRow(g, i.stageId, i.name.take(120), dur,
          i.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
      }
    def jobs(group: String): Int = synchronized(jobsPerGroup.getOrElse(group, 0))
    def stagesOf(group: String): Seq[StageRow] =
      synchronized(rows.filter(_.group == group).toSeq)
    def totalRows: Int = synchronized(rows.size)
  }

  /** Locale-independent fixed-decimal formatting for the profile JSON:
    * the f interpolator delegates to String.format under the DEFAULT
    * locale, which on a comma-decimal locale would emit `1,5` and break
    * the artifact's JSON. Double.toString is locale-free.
    */
  private def dec(x: Double, places: Int): String = {
    val p = math.pow(10, places)
    (math.rint(x * p) / p).toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Serve-only rows are safe even at BENCH_RUNS=1: shouldAttemptAgain
    // grants a publish-building attempt its follow-up regardless of the
    // budget, so the min always includes one serve-priced attempt.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Same pin as Verify/SparkSpec: the events loader's NTZ→Timestamp
      // normalization is exact only under UTC (Tables.normalizeEventTs).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Round-4 postmortem: the official bench died mid-run with
      // temp_shuffle files vanishing under a shared /tmp/spark-local
      // (external cleanup), taking the executor down with exit 56. Keep
      // shuffle/block storage under a directory this process owns.
      .config("spark.local.dir", GraftLocalDir.path)
      // The official bench runs on a loaded box (20-40x local wall time
      // observed); don't let a long GC pause read as a dead executor.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.enableOptimizations(spark)
    // A typo'd query name must not read as a perfect fast run: names that
    // match nothing are reported and fail the bench.
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}; " +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (name, _) => args.contains(name) }
    // Failures are recorded per query, never swallowed: a crashing query
    // must not read as a fast success that improves the total.
    // A second attempt only pays off when noise could dominate the first:
    // past this many seconds the measurement is signal, and re-running a
    // long query doubles the bench's wall time on the (20-40x slower)
    // official host for nothing.
    val repeatCutoffSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT_CUTOFF", "60").toDouble
    // Full materialization via the noop sink, NOT count(): count()
    // lets Catalyst prune every computed column a query doesn't
    // aggregate or join on, so pure-projection queries benchmarked
    // only their scan (q_text_repetition read 0.10s while its
    // projection actually cost 5.9s — found by StageAudit). The
    // noop sink consumes every row of the full result, which is
    // what a real downstream consumer pays.
    val profiler = new StageProfiler
    spark.sparkContext.addSparkListener(profiler)
    // Window-quality signal (round-15 verdict item 3: a 12-entry
    // noise_suspect ledger needed a machine-readable way to separate
    // "box was hot" from "code got slower" without re-running). Two
    // probes, both recorded start AND end of the suite: /proc/loadavg
    // (external pressure) and a fixed-cost CPU-bound calibration job
    // (what that pressure costs THIS process). A driver diff that sees
    // calib_end/calib_start or loadavg far off the committed window's
    // values knows the whole artifact priced hot.
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      catch { case scala.util.control.NonFatal(_) => "" }
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // pure codegen'd arithmetic over a fixed range: no I/O, no shuffle,
      // one task per core — its wall time moves only with CPU contention.
      // bit_xor, not sum: a 2e8-term sum of ~1e17 products overflows
      // long under ANSI mode; xor is closed over long.
      spark.range(0, 192L << 20, 1, cpus.toInt)
        .selectExpr("bit_xor(id * 2654435761)")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val loadavgStart = loadavg()
    // one untimed warm-up first: the very first Spark job in the JVM pays
    // codegen compile + classloading (measured 3.1s vs 0.3s steady-state),
    // which would make calib_start read "hot" on every run
    calibrate()
    val calibStart = calibrate()
    // mid-window calibration ticks (round-17 item 4): the same fixed-cost
    // probe every N queries, so heat that rises and falls BETWEEN the
    // endpoints (the r16 blind spot) lands in the artifact. At ~0.3 s per
    // tick, N=25 adds <1% to a 200-query window.
    val calibEvery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CALIB_EVERY", "25").toInt
    val calibTicks =
      scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, calibStart))
    def attempt(group: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String], Boolean) = {
      // per-attempt job group: how StageProfiler buckets stages. Thread-
      // local, and every job of the attempt runs on this thread.
      spark.sparkContext.setJobGroup(group, group)
      val pubBefore = SparkEntry.publishBuildCount
      val t0 = System.nanoTime()
      val err = try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        None
      } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(160))
      } finally spark.sparkContext.clearJobGroup()
      ((System.nanoTime() - t0) / 1e9, err,
        SparkEntry.publishBuildCount > pubBefore)
    }
    val attemptsByQuery = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(Double, Option[String], Boolean)]]
    selected.foreach { case (name, fn) =>
      val buf =
        scala.collection.mutable.ArrayBuffer.empty[(Double, Option[String], Boolean)]
      while (shouldAttemptAgain(buf.length, buf.count(_._3), nRuns,
               buf.lastOption.map(_._1).getOrElse(0.0),
               buf.lastOption.exists(_._3), repeatCutoffSec)) {
        buf += attempt(s"$name#${buf.length}", fn)
      }
      // Nudge the ContextCleaner: shuffle files and broadcasts are only
      // released when their owning objects are GC'd, and with a large heap
      // GC may not run for many queries — letting dead shuffle data from
      // earlier queries pile up under later timings.
      System.gc()
      attemptsByQuery(name) = buf.toSeq
      // mid-window tick; the final boundary is calib_end, so skip there
      if (calibEvery > 0 && attemptsByQuery.size % calibEvery == 0 &&
          attemptsByQuery.size < selected.size)
        calibTicks += ((attemptsByQuery.size, calibrate()))
    }
    // Noise-robust closing (round-11 postmortem: the committed artifact
    // landed on a noisy window and showed q_link_pairs_lev at 18.35 s —
    // a 2.8x phantom regression a 3-run re-measure erased). Any query
    // whose min exceeds 1.5x its frozen BASELINE_QUERIES.json entry gets
    // re-run in THIS fresh window (after all other queries, the closest
    // a single process gets to a fresh box state); queries still over
    // after the rechecks are flagged `noise_suspect` so a driver diff
    // against the baseline knows the delta was re-measured, not trusted.
    val baselinePath =
      sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE_QUERIES.json")
    // one file read feeds both the values map and the provenance window
    // counts (round-18 review: two reads of the same file left a window
    // where the two maps could come from different versions)
    val baselineTxt: String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(baselinePath)), "UTF-8")
    } catch { case scala.util.control.NonFatal(_) => "" }
    val baseline: Map[String, Double] = try {
      // Only per-query keys match q_* with a NUMBER value — provenance
      // entries are objects and never collide with the frozen values.
      "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*([0-9.eE+-]+)".r
        .findAllMatchIn(baselineTxt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
    // Window count behind each frozen entry, from the machine-readable
    // provenance map (round-18 item 5). A suspect against a 2-window
    // entry and one against a 40-window entry are different claims; the
    // artifact says which is which.
    val baselineWindows: Map[String, Int] =
      parseBaselineWindows(baselineTxt)
    val noiseFactor =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_NOISE_FACTOR", "1.5").toDouble
    val maxRechecks =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RECHECKS", "2").toInt
    def minOf(name: String): Double = attemptsByQuery(name).map(_._1).min
    // Rechecks respect the repeat cutoff like the main pass: a query
    // whose honest cost exceeds the cutoff would re-pay minutes per
    // recheck to chase a delta that is already signal at that size —
    // but such rows are SURFACED in `over_cutoff` below, never silently
    // dropped from the noise accounting.
    def classOf_(name: String): RecheckClass =
      recheckClass(minOf(name), baseline.get(name), noiseFactor,
        repeatCutoffSec, attemptsByQuery(name).exists(_._2.isDefined))
    def isOutlier(name: String): Boolean = classOf_(name) == RecheckEligible
    val outliers = attemptsByQuery.keys.filter(isOutlier).toSeq
    outliers.foreach { name =>
      val fn = selected(name)
      var extra = 0
      while (extra < maxRechecks && isOutlier(name)) {
        attemptsByQuery(name) =
          attemptsByQuery(name) :+ attempt(s"$name#${attemptsByQuery(name).length}", fn)
        System.gc()
        extra += 1
      }
    }
    val noiseSuspect = outliers.filter(isOutlier).sorted
    // Inflated-but-over-cutoff rows: excluded from rechecks by cost, so
    // the artifact must say so explicitly — a driver diff reads this
    // field as "inflated vs baseline, NOT re-measured" (round-15 verdict:
    // silently excluding them made the one mispriced serve row invisible
    // to every noise-handling path at once).
    val overCutoff = attemptsByQuery.keys
      .filter(classOf_(_) == RecheckOverCutoff).toSeq.sorted
    val loadavgEnd = loadavg()
    val calibEnd = calibrate()
    // end tick at position nQueries: rechecks ran just before it, so the
    // tail bracket (last mid tick → end) is the recheck region's
    calibTicks += ((attemptsByQuery.size, calibEnd))
    val hotFactor =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CALIB_HOT_FACTOR", "1.5").toDouble
    val mainPos = attemptsByQuery.keys.toSeq.zipWithIndex.toMap
    // a surviving suspect's min covers main-pass AND recheck attempts, so
    // annotate hot if EITHER its main-pass bracket or the recheck-region
    // tail bracket was hot
    def suspectHot(name: String): Boolean =
      bracketIsHot(calibTicks.toSeq, mainPos(name), hotFactor) ||
        bracketIsHot(calibTicks.toSeq, attemptsByQuery.size - 1, hotFactor)
    // A query counts as failed if ANY attempt failed — a crash that
    // sometimes passes is a flake, not a success.
    val results = attemptsByQuery.map { case (name, attempts) =>
      val err = attempts.collectFirst { case (_, Some(e), _) => e }
      name -> (attempts.map(_._1).min, attempts.map(_._1), err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, (v, _, _)) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, (_, a, _)) =>
      s"\"$k\":${a.mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, _, Some(e))) => s"\"$k\":${jstr(e)}" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2._3.isDefined)
    val total = results.values.map(_._1).sum
    // The driver captures only the LAST ~2000 chars of stdout; with 100+
    // queries the leading "value" headline scrolls out of that window.
    // Duplicate the headline fields at the very END of the object so any
    // tail capture, however short, still contains total/count/failed.
    val recheckedJson = outliers.sorted.map(jstr).mkString("[", ",", "]")
    val suspectJson = noiseSuspect.map(jstr).mkString("[", ",", "]")
    val overCutoffJson = overCutoff.map(jstr).mkString("[", ",", "]")
    // which attempt indices paid a standing publish, per row — the
    // serve-pricing contract made visible so a diff can tell a
    // publish-inclusive figure from a serve figure without code spelunking
    val publishJson = attemptsByQuery.collect {
      case (k, attempts) if attempts.exists(_._3) =>
        s"\"$k\":${attempts.zipWithIndex.collect { case ((_, _, true), i) => i }.mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val calibSeriesJson = calibTicks
      .map { case (p, s) => s"[$p,${dec(s, 3)}]" }.mkString("[", ",", "]")
    val suspectHotJson = noiseSuspect
      .map(n => s"${jstr(n)}:${suspectHot(n)}").mkString("{", ",", "}")
    // the provenance weight of each surviving suspect's entry: how many
    // recorded windows stand behind the baseline it is inflated against
    val suspectWindowsJson = noiseSuspect
      .map(n => s"${jstr(n)}:${baselineWindows.getOrElse(n, 0)}")
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"errors":$errs,"n_runs":$nRuns,"rechecked":$recheckedJson,"noise_suspect":$suspectJson,"suspect_hot_bracket":$suspectHotJson,"suspect_baseline_windows":$suspectWindowsJson,"over_cutoff":$overCutoffJson,"publish_attempts":$publishJson,"calib_start_s":${dec(calibStart, 3)},"calib_end_s":${dec(calibEnd, 3)},"calib_series":$calibSeriesJson,"loadavg_start":${jstr(loadavgStart)},"loadavg_end":${jstr(loadavgEnd)},"sf":"$sfDir","total_s":$total,"n_queries":${results.size},"failed":$nFailed}"""
    println(line)
    // The driver's stdout capture tail-truncates past ~2000 chars, losing
    // most per-query timings from the artifact (round-7 verdict: only ~45
    // of 147 survived). Persist the full line to a file the truncation
    // can't touch; committed per round so regressions are diffable.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench_full write failed: ${e.getMessage}") }
    // Stage-profile dump for every row the noise path FLAGGED (pre-
    // recheck outliers — the inflated in-suite attempts are the evidence
    // the quiet-window re-measures could never carry), plus any names
    // forced via SPARK_GRAFT_BENCH_PROFILE (comma-separated). The main
    // pass's attempts ran in suite order; trailing indices past it are
    // the post-suite rechecks — the same dump therefore holds the
    // in-suite/fresh-state comparison per stage. NOTE the main pass is
    // nRuns attempts for ordinary rows but can run longer for
    // publish-building rows (the shouldAttemptAgain exemption adds
    // in-suite attempts that don't consume the priced budget) — use the
    // artifact's publish_attempts field, not index arithmetic, to
    // classify a serve row's attempts.
    val forcedProfiles = sys.env.get("SPARK_GRAFT_BENCH_PROFILE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // a typo'd forced name must not vanish silently (same rule as the
    // args check above): say which names matched nothing
    val droppedProfiles = forcedProfiles.filterNot(attemptsByQuery.contains)
    if (droppedProfiles.nonEmpty)
      System.err.println("[bench] SPARK_GRAFT_BENCH_PROFILE names matched " +
        s"no executed query, dropped: ${droppedProfiles.mkString(", ")}")
    val watch = (outliers ++ forcedProfiles).distinct.sorted
      .filter(attemptsByQuery.contains)
    if (watch.nonEmpty) {
      // Listener-bus drain: stage events are async, and a fixed sleep
      // can undercount on a loaded host (low stage totals would then
      // masquerade as the driver-overhead diagnosis). Poll until the
      // profiler's row count is stable for two consecutive reads.
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 10000) {
        Thread.sleep(250); waited += 250
        val now = profiler.totalRows
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      // A drain that hit the cap may have missed late stage events — a
      // partial profile then shows low stage totals, which is exactly
      // the driver-overhead signature the dump exists to diagnose. Say
      // so in the artifact itself (and stderr) so a partial dump can't
      // masquerade as a genuine low-stage-total finding.
      val drainTimedOut = stable < 2
      if (drainTimedOut)
        System.err.println("[bench] listener-bus drain hit the 10s cap; " +
          "bench_profiles.json stage totals may undercount (see " +
          "drain_timeout field)")
      def stageJson(r: profiler.StageRow): String =
        s"""{"stage":${r.stageId},"name":${jstr(r.name)},"dur_ms":${r.durMs},""" +
          s""""tasks":${r.tasks},"run_ms":${r.runMs},"cpu_ms":${r.cpuMs},""" +
          s""""gc_ms":${r.gcMs},"in_mb":${dec(r.inMb, 1)},""" +
          s""""sh_read_mb":${dec(r.shReadMb, 1)},"sh_write_mb":${dec(r.shWriteMb, 1)},""" +
          s""""spill_mb":${dec(r.spillMb, 1)}}"""
      val profJson = watch.map { name =>
        val attempts = attemptsByQuery(name).zipWithIndex.map {
          case ((wall, err, _), i) =>
            val g = s"$name#$i"
            val all = profiler.stagesOf(g)
            val stages = all.sortBy(-_.durMs).take(100)
            // headline totals: when stage_dur_ms is far under wall_s the
            // attempt's cost is driver-side (planning/scheduling), not
            // task work — the q_epoch_mix diagnosis, pre-computed
            s"""{"attempt":$i,"wall_s":${dec(wall, 2)},"jobs":${profiler.jobs(g)},""" +
              s""""n_stages":${all.size},""" +
              s""""stage_dur_ms":${all.map(_.durMs).sum},""" +
              s""""run_ms":${all.map(_.runMs).sum},"gc_ms":${all.map(_.gcMs).sum},""" +
              s""""spill_mb":${dec(all.map(_.spillMb).sum, 1)},""" +
              s""""err":${err.map(jstr).getOrElse("null")},""" +
              s""""stages":${stages.map(stageJson).mkString("[", ",", "]")}}"""
        }
        s"${jstr(name)}:{" +
          s""""baseline_s":${baseline.get(name).map(_.toString).getOrElse("null")},""" +
          s""""attempts":${attempts.mkString("[", ",", "]")}}"""
      }.mkString(s"""{"drain_timeout":$drainTimedOut,""", ",", "}")
      val profOut =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PROFILE_OUT", "bench_profiles.json")
      try java.nio.file.Files.write(java.nio.file.Paths.get(profOut),
        (profJson + "\n").getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench_profiles write failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
