package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — split each document into fixed-width character
  * windows with overlap, the step every LLM training pipeline runs between
  * cleaning and tokenization (context-length packing wants units smaller
  * than a whole crawled page; retrieval indexing wants overlapping windows
  * so no span straddles a boundary unseen).
  *
  * Pure narrow transform: a `sequence` of chunk starts + `posexplode` +
  * `substr`, all whole-stage-codegen — no shuffle, no UDF, scales as a
  * scan. Chunk count per doc is 1 + floor((len-1)/stride) (every char
  * covered, one empty chunk for an empty doc), so output size is
  * ~len/stride rows per doc, bounded and predictable for the shuffle that
  * FOLLOWS chunking (usually a repartition into training shards —
  * [[Packing.pack]] consumes exactly this shape).
  *
  * `size > stride` gives `size - stride` chars of overlap between
  * consecutive chunks; `size == stride` is exact partitioning. Indices are
  * CHARACTER-based (Spark `length`/`substr` count code points), matching
  * the DuckDB oracle's semantics (q_chunk_docs).
  */
object Chunker {

  /** One row per (doc, chunk): doc_id, chunk_idx, chunk (text), chunk_len. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need size >= stride > 0, got size=$size stride=$stride")
    val lastIdx = greatest(
      floor((length(col(textCol)) - 1) / stride).cast("int"), lit(0))
    df.select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), lastIdx)).as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col(textCol).substr(col("_start") * stride + 1, lit(size)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** [[chunk]] in TOKEN units — the window the training pipeline actually
    * budgets by (context length is tokens, not characters; a char window
    * can split a word mid-way, a token window never does). One row per
    * (doc, chunk): doc_id, chunk_idx, chunk (space-rejoined tokens),
    * chunk_tokens. `maxTokens > stride` overlaps consecutive chunks by
    * maxTokens - stride tokens; every token is covered; an empty doc
    * yields one empty chunk (same contract as [[chunk]]).
    *
    * Same scale shape as the char form: tokenize + `sequence` of starts +
    * posexplode + `slice`/`concat_ws`, all codegen collection ops — no
    * shuffle, no UDF. Rejoining on single spaces normalizes intra-chunk
    * whitespace (documented; the token multiset is what downstream
    * tokenization consumes).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  maxTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && maxTokens >= stride,
      s"need maxTokens >= stride > 0, got maxTokens=$maxTokens stride=$stride")
    val toks = TextOps.tokens(col(textCol))
    val lastIdx = greatest(
      floor((size(toks) - 1) / stride).cast("int"), lit(0))
    df.select(col(idCol), toks.as("_t"),
        posexplode(sequence(lit(0), lastIdx)).as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("_t"), col("_start") * stride + 1, lit(maxTokens)).as("_w"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", col("_w")).as("chunk"),
        size(col("_w")).cast("long").as("chunk_tokens"))
  }
}
