package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-capacity context
  * windows (north-star scope: the last step of every LLM pretraining data
  * pipeline is concatenating documents into `capacity`-token training
  * sequences; the operator computes which sequence each document starts
  * in and at what offset).
  *
  * Model: the GPT-style "concatenate then split" packing — documents are
  * laid end-to-end in a deterministic order and the stream is cut every
  * `capacity` tokens, so a document's sequence is floor(start / capacity).
  * This is a prefix sum, which is inherently sequential PER STREAM — so
  * the operator packs WITHIN SHARDS (the window partitions by `shardCol`):
  * each shard is an independent stream packed in parallel, which is
  * exactly how production pipelines do it (one stream per input shard,
  * no global coordination). A single global stream would serialize 100 TB
  * through one partition; sharding is the scale design, not a
  * compromise.
  */
object Packing {

  /** Per-document packing assignment within each shard: token count, start
    * offset in the shard's concatenated token stream (docs ordered by id),
    * and the `capacity`-token sequence index the document starts in.
    * Documents with zero tokens occupy no space (n_tokens 0; they inherit
    * the running offset).
    */
  def pack(df: DataFrame, idCol: String, textCol: String, shardCol: String,
           capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(shardCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_index", floor(col("start_offset") / capacity))
  }

  /** BOUNDARY-RESPECTING packing — the other production packing model
    * ([[pack]] is GPT concat-then-split, where documents cross sequence
    * boundaries): here a document NEVER spans a boundary. Instruction
    * tuning and any objective with per-document loss masking wants this
    * form; the price is padding at each sequence tail, which
    * [[packingEfficiency]] quantifies.
    *
    * Greedy first-fit-in-order fold per shard (docs by id): a doc goes to
    * the current sequence if it fits, else opens the next one; a doc
    * longer than `capacity` gets fresh sequences to itself and its tail
    * starts the fill of its last one (crossing inside a single oversized
    * doc is unavoidable under any model). Zero-token docs occupy nothing
    * and inherit (seq_index, seq_offset). Output: one row per doc —
    * (idCol, shardCol, n_tokens, seq_index, seq_offset).
    *
    * Scale shape: the fold is inherently sequential PER SHARD (the reset
    * depends on all history — not window-expressible), so this is the one
    * legitimate per-partition imperative case: repartition by shard +
    * sortWithinPartitions, then a single iterator-streaming pass with
    * O(1) state per partition (no shard is ever materialized in memory).
    * Shards pack in parallel, exactly like [[pack]].
    */
  def packBoundaried(df: DataFrame, idCol: String, textCol: String,
                     shardCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val base = df.select(col(idCol), col(shardCol),
      TextOps.tokenCount(col(textCol)).as("n_tokens"))
    val parted = base.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(idCol))
    val cap = capacity.toLong
    val rdd = parted.rdd.mapPartitions { it =>
      // per-partition fold state; a partition may hold several shards
      // (hash co-location), so reset on every shard change
      var curShard: Any = null
      var started = false
      var seq = 0L
      var fill = 0L
      it.map { r =>
        val sh = r.get(1)
        if (!started || sh != curShard) {
          curShard = sh; started = true; seq = 0L; fill = 0L
        }
        val n = r.getLong(2)
        if (n > 0 && fill > 0 && fill + n > cap) { seq += 1; fill = 0 }
        val (si, so) = (seq, fill)
        if (n > 0) {
          val whole = (fill + n - 1) / cap
          seq += whole
          fill = fill + n - whole * cap
        }
        org.apache.spark.sql.Row(r.get(0), sh, n, si, so)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      parted.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("seq_index",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("seq_offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rdd, schema)
  }

  /** Padding-waste audit over a [[packBoundaried]] result: per shard, the
    * sequence count, used vs padded tokens, and utilization — the number
    * that decides whether the chosen capacity (context length) fits the
    * document length distribution. One hash aggregate; the sequence count
    * is derived per doc as seq_index + ceil((seq_offset + n_tokens) /
    * capacity) and maxed (exact integer arithmetic on both engines).
    * Shards holding only zero-token docs report 0 sequences and null
    * utilization.
    */
  def packingEfficiency(packed: DataFrame, shardCol: String,
                        capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val cap = capacity.toLong
    val seqsSpanned = when(col("n_tokens") > 0,
      col("seq_index") +
        ((col("seq_offset") + col("n_tokens") + (cap - 1)).cast("long") / cap)
          .cast("long"))
      .otherwise(lit(0L))
    packed.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("used_tokens"),
        coalesce(max(seqsSpanned), lit(0L)).as("n_seqs"))
      .select(col(shardCol), col("n_docs"), col("used_tokens"), col("n_seqs"),
        (col("n_seqs") * cap - col("used_tokens")).as("padding_tokens"),
        when(col("n_seqs") > 0,
          col("used_tokens").cast("double") / (col("n_seqs") * cap))
          .as("utilization"))
  }
}
