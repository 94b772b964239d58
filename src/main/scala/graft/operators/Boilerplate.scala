package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-granularity corpus boilerplate removal — the C4 / RefinedWeb /
  * CCNet cleaning tier between document-level dedup (Dedup / NearDup:
  * whole docs) and pairwise span dedup (SubstringDedup: verbatim runs
  * shared by a specific doc PAIR). Here the unit is a SEGMENT (this
  * corpus has no newlines, so "line" = an aligned k-token window, the
  * same unit as [[Chunker.chunkTokens]] with stride = size), and the
  * signal is CORPUS-WIDE PREVALENCE: a segment that appears in >= minDocs
  * distinct documents is boilerplate (nav bars, cookie banners, licence
  * headers) and is dropped from EVERY document — no keeper, matching the
  * C4 "discard any line seen in multiple pages" rule rather than the
  * keep-one semantics of dedup (SubstringDedup.removeSharedSpans keeps
  * the lower-id copy; both tiers are useful and they compose).
  *
  * Scale shape: segmentation is the shuffle-free codegen path of
  * [[Chunker.chunkTokens]]; prevalence is ONE hash aggregate on the
  * segment text (map-side combinable count_distinct via the two-level
  * (segment, doc) collapse — never a corpus-wide window); removal is a
  * left-anti equi-join of segments against the flagged set, and document
  * reassembly is one more hash aggregate ordered by segment index inside
  * the group (sort_array over a per-doc array bounded by doc length, not
  * a global sort). Every stage is linear shuffle + hash agg; nothing is
  * quadratic and nothing broadcasts an unbounded side (the flagged-set
  * join carries no hint — AQE broadcasts it when it is genuinely small,
  * which is the common case: boilerplate vocabularies are tiny relative
  * to the corpus).
  */
object Boilerplate {

  /** Aligned non-overlapping k-token segments: one row per (doc, segment)
    * with columns (idCol, seg_idx, segment, seg_tokens). Exactly
    * [[Chunker.chunkTokens]] with stride = size (every token covered once;
    * an empty doc yields one empty segment, so reassembly preserves the
    * document row).
    */
  def segments(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // FanOut.widen: tokenization + window slicing is the tier's heavy
    // projection and runs before any exchange — single-task on an
    // under-partitioned scan (guide §2.5); no-op at corpus scale
    Chunker.chunkTokens(FanOut.widen(df), idCol, textCol, k, k)
      .withColumnRenamed("chunk_idx", "seg_idx")
      .withColumnRenamed("chunk", "segment")
      .withColumnRenamed("chunk_tokens", "seg_tokens")

  /** Corpus-wide segment prevalence: for each distinct segment text, the
    * number of distinct documents containing it and its total occurrence
    * count. The audit view a cleaning run reads before choosing minDocs
    * (the same measure-then-act shape as lshRecallEval / corpusProfile).
    * Filtered to segments seen in >= minDocs docs; empty segments (empty
    * docs) are excluded — they are absence, not boilerplate.
    */
  def segmentPrevalence(df: DataFrame, idCol: String, textCol: String,
                        k: Int, minDocs: Int): DataFrame =
    segments(df, idCol, textCol, k)
      .filter(col("seg_tokens") > 0)
      .groupBy(col("segment"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Single-pass reassembly + accounting over segment rows carrying a
    * keep condition: ONE hash aggregate per document computes the total
    * segment count AND collects the surviving segments (collect_list
    * skips the nulls the `when` produces for dropped segments), so no
    * second corpus scan and no totals join. The per-doc array is bounded
    * by the document's own segment count; sort_array orders by seg_idx
    * (first struct field) so reassembly is deterministic.
    */
  private def rebuildKept(seg: DataFrame, idCol: String,
                          keep: Column): DataFrame =
    seg.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segments"),
        sort_array(collect_list(
          when(keep, struct(col("seg_idx"), col("segment"))))).as("_segs"))
      .select(col(idCol),
        array_join(transform(col("_segs"), s => s("segment")), " ")
          .as("clean_text"),
        col("n_segments"),
        (col("n_segments") - size(col("_segs"))).as("n_dropped"))

  /** Drop every occurrence of every segment that appears in >= minDocs
    * distinct documents, and reassemble each document from its surviving
    * segments in order. Output: one row per input document — (idCol,
    * clean_text, n_segments, n_dropped). A document whose every segment
    * is boilerplate survives as clean_text = '' (the row is the unit of
    * accounting; dropping it is a separate curation decision the caller
    * makes on n_dropped / n_segments).
    *
    * Plan: segment scan → left join against the flagged set (no hint —
    * AQE broadcasts it when small, the common case) → one per-doc hash
    * aggregate. The prevalence aggregate re-derives segments from the
    * same shuffle-free projection, so the corpus is scanned twice only
    * in the cheap codegen stage, never re-shuffled.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        k: Int, minDocs: Int): DataFrame =
    removeBoilerplateWith(df, idCol, textCol, k,
      segmentPrevalence(df, idCol, textCol, k, minDocs))

  /** [[removeBoilerplate]] against a STANDING flagged-segment table
    * (any DataFrame with a `segment` column — e.g. a persisted
    * [[segmentPrevalence]] audit). The two-phase split production wants:
    * compute prevalence once over the full corpus, then apply the same
    * flagged set to later batches or at stream ingest (the flagged table
    * is the static side of a stream-static join, re-planned per
    * micro-batch like EventOps.enrichStream) — without re-scanning the
    * corpus that defined it.
    */
  def removeBoilerplateWith(df: DataFrame, idCol: String, textCol: String,
                            k: Int, flaggedSegments: DataFrame): DataFrame = {
    val seg = segments(df, idCol, textCol, k)
    val flagged = flaggedSegments
      .select(col("segment")).distinct()
      .withColumn("_flag", lit(true))
    val marked = seg.join(flagged, Seq("segment"), "left")
    rebuildKept(marked, idCol, col("_flag").isNull)
  }

  /** Intra-document repetition removal: within each document, keep only
    * the FIRST occurrence of each distinct segment (the "duplicate line
    * fraction" Gopher signal, as a transform instead of a filter — the
    * cure for machine-generated pages that loop one paragraph). Keeps the
    * k-token unit consistent with [[removeBoilerplate]]; the two compose
    * in either order because first-occurrence keep is idempotent.
    *
    * Shape: the dedup window partitions by (doc, segment) — per-document
    * keys, so the shuffle is corpus-linear with no global hot key (a
    * repeated segment inside one doc is bounded by that doc's length),
    * then the same single-pass per-doc rebuild aggregate.
    */
  def dedupSegmentsWithinDoc(df: DataFrame, idCol: String, textCol: String,
                             k: Int): DataFrame = {
    val seg = segments(df, idCol, textCol, k)
    val w = Window.partitionBy(col(idCol), col("segment")).orderBy(col("seg_idx"))
    rebuildKept(seg.withColumn("_rn", row_number().over(w)),
      idCol, col("_rn") === 1)
  }
}
