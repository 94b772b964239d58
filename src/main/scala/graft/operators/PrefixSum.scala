package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running total (prefix sum) — cumulative curves over
  * a total order: cumulative tokens shipped to a training mix, cumulative
  * bytes per day, concurrency sweeps (+1/-1 deltas), monotonic offset
  * assignment. The naive Spark form
  * `sum(v) OVER (ORDER BY k)` is a WINDOW WITH NO PARTITION: every row
  * shuffles into ONE task and the cluster serializes — the single worst
  * scaling cliff in the window API (Spark even logs a warning). This is
  * the textbook two-phase scan instead:
  *
  *   1. `repartitionByRange(orderCol)` — each partition owns a contiguous
  *      key range (one shuffle, same as any sort);
  *   2. per-partition local running sum (in-partition window — parallel);
  *   3. per-partition totals to the driver (numPartitions longs — KBs),
  *      exclusive-scanned into per-partition offsets;
  *   4. broadcast the offsets back and add.
  *
  * Wall-clock is one shuffle + one parallel scan, identical to a sort —
  * at any scale. The partitioned frame is materialized once
  * (localCheckpoint) because steps 2 and 3 must observe the SAME range
  * boundaries — repartitionByRange samples boundaries per job, so
  * recomputation could split differently between the two passes.
  *
  * Caller contract: `orderCol` values are UNIQUE (pre-aggregate to the
  * grain first — q_cum_shipments groups to one row per day); with
  * duplicate keys the intra-key order, and thus each duplicate's running
  * value, would be nondeterministic in ANY engine.
  */
object PrefixSum {

  /** The shared two-phase core (steps 1–4 of the class doc): inclusive
    * running sum of `value` in `orderCols` order, emitted as `outCol`.
    * The eager localCheckpoint is load-bearing — steps 2 and 3 must see
    * the SAME sampled range boundaries (class doc).
    */
  private def twoPhase(df: DataFrame, orderCols: Seq[String], value: Column,
                       outCol: String, numParts: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = orderCols.map(col)
    val parted = df
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__local", sum(value).over(w))
    val totals = parted.groupBy(col("__pid"))
      .agg(sum(value).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Adds `cum_<valueCol>`: the inclusive running total of `valueCol` in
    * `orderCol` order. `valueCol` must be integral (LongType result).
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
                   numParts: Int = 0): DataFrame =
    twoPhase(df, Seq(orderCol), col(valueCol).cast("long"),
      s"cum_$valueCol", numParts)

  /** Adds `pos`: each row's 1-based GLOBAL position in `orderCols` order —
    * the distributed form of `row_number() OVER (ORDER BY ...)`, which in
    * plain Spark is the same single-task window cliff as the unpartitioned
    * running sum (class doc); here it is [[twoPhase]] with value 1 (a
    * rows-frame running count of ones IS row_number). Caller contract:
    * the `orderCols` combination is UNIQUE per row (append a tie-breaker
    * id — otherwise positions within a duplicate key are
    * nondeterministic in any engine).
    */
  def densePositions(df: DataFrame, orderCols: Seq[String],
                     numParts: Int = 0): DataFrame =
    twoPhase(df, orderCols, lit(1L), "pos", numParts)

  /** GROUPED running total: the inclusive prefix sum of `valueCol` in
    * `orderCols` order, resetting per `groupCol` — same two-phase scan as
    * [[runningTotal]], so a single giant group never collapses into one
    * window task (the plain `PARTITION BY group ORDER BY k` window caps
    * parallelism at the number of groups — 20 sources means 20 tasks no
    * matter the cluster; range-partitioning on (group, order) keeps every
    * core busy and a group just spans several contiguous partitions).
    *
    * Driver state: one (partition, group) total per group-span — bounded
    * by numParts + distinct groups present, KBs. The per-group exclusive
    * scan over partition ids yields each span's offset; offsets join back
    * broadcast on (partition, group).
    *
    * Caller contract: (groupCol, orderCols*) is UNIQUE per row (same
    * reasoning as [[runningTotal]] — duplicate keys make the intra-key
    * running value nondeterministic in any engine).
    */
  def runningTotalBy(df: DataFrame, groupCol: String, orderCols: Seq[String],
                     valueCol: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = col(groupCol) +: orderCols.map(col)
    val parted = df
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__local",
      sum(col(valueCol).cast("long")).over(w))
    val totals = parted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    val offsetRows: Seq[org.apache.spark.sql.Row] = totals
      .groupBy(_._2).toSeq.flatMap { case (_, spans) =>
        var acc = 0L
        spans.sortBy(_._1).map { case (pid, g, t) =>
          val row = org.apache.spark.sql.Row(pid, g, acc)
          acc += t
          row
        }
      }
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType),
      df.schema(groupCol).copy(name = groupCol),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
      .withColumnRenamed(groupCol, "__g")
    // Null-safe group match: a null group key is a legitimate group (all
    // upstream stages — range partition, window, totals — already treat
    // it as one), and a plain equi-join would silently DROP its rows here.
    local.join(broadcast(offDf),
        local("__pid") === offDf("__pid") && local(groupCol) <=> offDf("__g"))
      .drop(offDf("__pid")).drop("__g")
      .withColumn(s"cum_$valueCol", col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }
}
