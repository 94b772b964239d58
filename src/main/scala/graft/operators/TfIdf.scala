package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over the documents table (north-star scope: the
  * keyword/salience signal a training-data pipeline uses for topic
  * filtering and near-boilerplate detection; the reference has no text
  * scoring at all).
  *
  * Shape, 100 TB posture: term frequencies are a hash aggregate on
  * (doc, term); document frequencies a hash aggregate on term; the idf
  * re-attach is a 1:1 equi-join on term (the build side has exactly one
  * row per vocabulary term, so a hot stopword term skews partition VOLUME,
  * which AQE rebalances, but never fans out rows). Top-k per doc is a
  * bounded window — rank <= k cuts each partition stream early. No
  * all-pairs anywhere; every stage is linear in corpus token count.
  *
  * FP parity: idf is the RATIONAL form (n_docs + 1) / (df + 1) rather
  * than the textbook ln of it — division is a single correctly-rounded
  * IEEE op, bit-identical across engines, whereas libm `ln` may differ in
  * the last ulp between Spark's JVM and the oracle's libm, which a hash
  * compare would flag. Ranking is unaffected (ln is monotone).
  */
object TfIdf {

  /** Per-document top-k terms by tf-idf: (id, term, tf, score, rank) with
    * deterministic (score DESC, term ASC) tie-break. Tokens are the same
    * lowercased whitespace tokens as [[TextOps.tokens]]; documents with no
    * tokens produce no rows.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // Corpus size as a ONE-ROW aggregate cross-joined in (broadcast of a
    // single long): keeps the whole computation one lazy plan — an eager
    // .count() here would run a full scan+aggregate job at DataFrame
    // CONSTRUCTION time and then recompute tf again at execution.
    val nDocs = tf.select(count_distinct(col("id")).as("__nd"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * ((col("__nd") + lit(1.0)) / (col("dfreq") + lit(1.0))))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("score"), col("rank"))
  }
}
