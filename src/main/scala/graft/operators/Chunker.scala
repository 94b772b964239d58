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

  /** Content-defined chunking (the FastCDC/rolling-hash family, at token
    * granularity): a token opens a NEW chunk when its 60-bit md5 hash is
    * ≡ 0 (mod `maskMod`) — boundaries depend only on LOCAL content, so a
    * duplicated span of text produces byte-identical chunks wherever it
    * appears and at whatever offset (fixed-width chunking breaks on the
    * first inserted token; that offset-resilience is the whole reason
    * storage dedup uses CDC). Expected chunk length ≈ maskMod tokens.
    *
    * One row per (doc, chunk): doc_id, chunk_idx (running boundary count,
    * first chunk 0 or 1 by its own flag), n_tokens, chunk_hash (md5 of
    * the space-rejoined tokens). Empty docs emit nothing.
    *
    * Scale shape: tokenize + posexplode (narrow), ONE shuffle on doc_id
    * for the running-boundary-count window, then the (doc, chunk_idx)
    * rebuild aggregate reuses the same partitioning (hash(doc_id)
    * satisfies the grouping's clustered distribution — no second
    * shuffle). Window partitions are single documents — the standard
    * per-doc-window caveat, bounded by document length, never by corpus.
    * Token-level boundaries (not the byte-level gear hash) keep the
    * whole operator relational: no per-byte driver loop, no UDF, and a
    * DuckDB oracle that replays it row for row.
    */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
                           maskMod: Int): DataFrame = {
    require(maskMod > 1, s"need maskMod > 1, got $maskMod")
    import org.apache.spark.sql.expressions.Window
    val tokp = df
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .withColumn("b",
        when(graft.functions.md5hash60(col("tok")) % maskMod === 0, 1L)
          .otherwise(0L))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokp.withColumn("chunk_idx", sum(col("b")).over(w))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("chunk_hash"))
  }

  /** Cross-corpus chunk-dedup report over [[contentDefinedChunks]]: one
    * row per distinct chunk content — (chunk_hash, n_tokens, n_copies,
    * n_docs, dup_tokens, is_dup), where dup_tokens = (n_copies − 1) ·
    * n_tokens is the token mass CDC-dedup storage would reclaim. One
    * hash aggregate on chunk_hash; report size is the distinct-chunk
    * count, never the corpus.
    */
  def cdcDedupReport(df: DataFrame, idCol: String, textCol: String,
                     maskMod: Int): DataFrame =
    contentDefinedChunks(df, idCol, textCol, maskMod)
      .groupBy("chunk_hash")
      .agg(max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_copies"),
        count_distinct(col(idCol)).as("n_docs"))
      .withColumn("dup_tokens", (col("n_copies") - 1) * col("n_tokens"))
      .withColumn("is_dup", col("n_copies") > 1)

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
