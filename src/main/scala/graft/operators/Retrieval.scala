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

  /** BM25 ranking of documents against a bag of query terms — the lexical
    * retrieval half of a RAG / retrieval-augmented curation pipeline
    * (dense ANN lives in [[Ann]]; this is its sparse complement, and the
    * standard first-stage ranker before any reranking).
    *
    * Formula per (doc, term): idf_r(term) · tf·(k1+1) / (tf + k1·(1 − b +
    * b·dl/avgdl)), summed over matched query terms. Two deliberate
    * divergences from the textbook constants, both for engine parity (the
    * repo-wide FP contract — see TfIdf/LanguageModel):
    *
    *  - idf_r = (N − df + 0.5) / (df + 0.5) is the RATIONAL inside of the
    *    usual ln — a single correctly-rounded division instead of a libm
    *    call that differs in the last ulp across engines. Monotone in df,
    *    so per-term ordering is preserved; the cross-term mix differs
    *    from Robertson idf but remains a fixed, documented scoring
    *    function.
    *  - defaults k1 = 1.25, b = 0.75: the exactly-representable doubles
    *    nearest the textbook 1.2/0.75, so k1+1 and 1−b are EXACT and the
    *    whole expression tree is reproducible literal-for-literal in SQL.
    *
    * Each (doc, term) score freezes to fixed point (round(1e12·s) as
    * BIGINT — every op correctly rounded, same tree both engines) and
    * documents aggregate with exact integer sums, order-independent.
    *
    * Scale shape: dl/avgdl is one hash aggregate plus a one-row broadcast;
    * tf touches only rows whose token is in the query set (predicate on
    * the exploded stream — scan-speed, codegen); the final top-k is
    * TakeOrderedAndProject (bounded heap), never a global sort. No
    * all-pairs, no window over the corpus.
    *
    * Output: top `k` docs by (score_e12 DESC, id ASC) —
    * (idCol, dl, n_terms, score_e12). Caller contract: `terms` non-empty,
    * lowercase, distinct.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be non-empty and distinct")
    val (tok, dl, stats) = bm25Corpus(docs, idCol, textCol)
    val tf = tok.select(col("id"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val scored = tf
      .join(dfreq, "term")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("s_e12", bm25ScoreE12(k1, b))
    scored.groupBy(col("id").as(idCol))
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        sum(col("s_e12")).as("score_e12"))
      .orderBy(col("score_e12").desc, col(idCol))
      .limit(k)
  }

  /** Tokenized corpus, per-doc lengths, and the one-row (n_docs, sum_dl)
    * stats — shared by the single-query and batch BM25 forms.
    */
  private def bm25Corpus(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val tok = docs.select(col(idCol).as("id"),
      TextOps.tokens(lower(col(textCol))).as("t"))
    val dl = tok.filter(size(col("t")) > 0)
      .select(col("id"), size(col("t")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (tok, dl, stats)
  }

  /** The per-(doc, term) BM25 score at e12 over columns (tf, dfreq, dl,
    * n_docs, sum_dl) — ONE expression tree shared by the single-query and
    * batch forms so the SQL mirror stays literal-for-literal.
    */
  private def bm25ScoreE12(k1: Double, b: Double): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idfR = ((col("n_docs") - col("dfreq")).cast("double") + lit(0.5)) /
      (col("dfreq").cast("double") + lit(0.5))
    round(lit(1.0e12) * (idfR *
      ((col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") + lit(k1) *
          (lit(1.0 - b) + lit(b) *
            (col("dl").cast("double") / avgdl)))))).cast("long")
  }

  /** BATCH BM25 — the production retrieval shape: one pass scores EVERY
    * query in a (small) query table against the corpus, instead of one
    * corpus scan per query. Output: top `k` docs per query —
    * (qIdCol, rank, idCol, dl, n_terms, score_e12), rank by
    * (score_e12 DESC, id).
    *
    * Scale shape: the corpus token stream is pruned by a broadcast
    * semi-join on the DISTINCT query vocabulary (bounded by the query
    * batch, not the corpus) before any aggregation, so tf/df cost is
    * proportional to query-relevant tokens only; the per-query fan-out
    * joins the (id, term, tf) postings to the broadcast (query, term)
    * table — output is bounded by matching postings × queries sharing
    * the term; top-k is a per-query bounded window. Same scorer, same
    * FP contract as [[bm25TopK]].
    */
  def bm25Batch(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qIdCol: String, qTextCol: String,
                k: Int, k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val qterm = queries.select(col(qIdCol).as("query_id"),
        explode(TextOps.tokens(lower(col(qTextCol)))).as("term"))
      .distinct()
    val (tok, dl, stats) = bm25Corpus(docs, idCol, textCol)
    val vocab = qterm.select("term").distinct()
    val tf = tok.select(col("id"), explode(col("t")).as("term"))
      .join(broadcast(vocab), "term")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val scored = tf
      .join(dfreq, "term")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("s_e12", bm25ScoreE12(k1, b))
      .join(broadcast(qterm), "term")
    val agg = scored.groupBy(col("query_id"), col("id").as(idCol))
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        sum(col("s_e12")).as("score_e12"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score_e12").desc, col(idCol))
    agg.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id").as(qIdCol), col("rank"), col(idCol),
        col("dl"), col("n_terms"), col("score_e12"))
  }

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
