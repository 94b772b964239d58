package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-indexing composite: chunk documents, embed each chunk, search
  * top-k similar chunks — the indexing half of a RAG pipeline, assembled
  * from the engine's own operators ([[Chunker.chunk]] →
  * [[Retrieval.stubEmbedding]] → [[Ann.cosineTopK]]).
  *
  * The embedder is a STUB by necessity (no model runtime in this
  * environment — same honesty contract as [[Multimodal.decodeStub]]): a
  * deterministic md5-derived vector per chunk, so the composite's
  * plumbing (chunk ids, embedding schema, the scorer, ranking) is real
  * and end-to-end DuckDB-oracle-able; swapping in a real encoder is a
  * one-line change at the `stubEmbedding` call site (e.g. a mapPartitions
  * batch over an ONNX session — the shape [[Multimodal.decodeBatched]]
  * already demonstrates).
  *
  * Scale: chunking and embedding are shuffle-free projections; search is
  * [[Ann.cosineTopK]]'s exact broadcast baseline here (bounded query set),
  * with [[Ann.lshTopK]]/[[Ann.ivfSearch]] as the declared scale paths over
  * the same embedded-chunk table.
  */
object Retrieval {

  /** Deterministic stub embedding: component i of `dim` is
    * md5hash60(i+1, text)/2^60 ∈ [0,1) — engine-exact on both sides of
    * the oracle (same md5-derived BIGINT, same round-to-nearest
    * long→double cast, exact power-of-two scale).
    */
  def stubEmbedding(c: Column, dim: Int): Column =
    array((0 until dim).map { i =>
      graft.functions.md5hash60(c, seed = i + 1).cast("double") /
        lit(1152921504606846976.0) // 2^60
    }: _*)

  /** Chunk ids are doc_id·1000 + chunk_idx — numeric, unique while every
    * document has fewer than 1000 chunks (caller contract: size/stride
    * must bound chunk counts accordingly), and trivially mirrored in SQL.
    */
  val ChunkIdFactor = 1000L

  /** The composite: top-k most similar chunks (self included, rank 1) for
    * every chunk whose id matches `queryMod` — (query_id, rank, vec_id,
    * sim) over chunk ids.
    */
  def chunkRetrievalTopK(docs: DataFrame, idCol: String, textCol: String,
                         size: Int, stride: Int, dim: Int,
                         queryMod: Long, k: Int): DataFrame = {
    val chunks = Chunker.chunk(docs, idCol, textCol, size, stride)
    val embedded = chunks
      .select((col(idCol) * ChunkIdFactor + col("chunk_idx")).as("cid"),
        stubEmbedding(col("chunk"), dim).as("emb"))
    Ann.cosineTopK(embedded, "cid", "emb", col("vec_id") % queryMod === 0, k)
  }
}
