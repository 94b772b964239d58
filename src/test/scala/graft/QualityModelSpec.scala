package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha alpha alpha"), // repeats must count as occurrences
    (3L, ""),                 // token-less: scores 0, kept
    (4L, "ALPHA Beta"),       // case-folds to the same buckets as doc 1's
    (5L, "  spaced   out  ")
  ).toDF("doc_id", "text")

  test("score equals a hand-computed weight lookup, repeats included") {
    val w = QualityModel.pseudoWeights(spark).as[(Long, Long)].collect().toMap
    assert(w.size == QualityModel.NumBuckets)
    assert(w.values.forall(v =>
      v >= -QualityModel.WeightMicro && v <= QualityModel.WeightMicro))
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % QualityModel.NumBuckets
    }
    val expected1 = Seq("alpha", "beta", "gamma").map(t => w(bucket(t))).sum
    val expected2 = 3 * w(bucket("alpha"))
    val out = QualityModel.score(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("score_micro"),
          r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == ((3L, expected1, expected1 >= 0)))
    assert(out(2L) == ((3L, expected2, expected2 >= 0)))
    assert(out(3L) == ((0L, 0L, true)))
    // lowercase fold: doc 4's tokens hit doc 1's buckets
    assert(out(4L)._2 == Seq("alpha", "beta").map(t => w(bucket(t))).sum)
    assert(out(5L)._1 == 2L)
  }

  test("one row per input row; a custom weight table drops in") {
    // all-zero model: every doc scores 0 and is kept
    val zero = spark.range(QualityModel.NumBuckets)
      .select(col("id").as("bucket"), lit(0L).as("w_micro"))
    val out = QualityModel.scoreWith(docs, "doc_id", "text", zero)
    assert(out.count() == docs.count())
    assert(out.filter(col("score_micro") =!= 0 || !col("keep")).count() == 0)
  }

  test("weight-table broadcast survives in the plan") {
    val plan = QualityModel.score(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
