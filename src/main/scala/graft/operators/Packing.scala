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
}
