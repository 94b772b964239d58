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

  test("trainCentroid: perfect on a separable toy; learns past majority on the fixture") {
    // separable toy: positives all mention 'needle', negatives never do
    val toy = ((1L to 20L).map(i => (i, s"needle common$i filler words here")) ++
      (21L to 40L).map(i => (i, s"haystack common$i filler words here")))
      .toDF("doc_id", "text")
    val toyLabel = array_contains(
      graft.operators.TextOps.tokens(lower(col("text"))), "needle")
    val toyAcc = QualityModel.centroidEval(toy, "doc_id", "text", toyLabel)
      .as[(Long, Long, Long)].first()
    assert(toyAcc == ((40L, 40L, 1000L)), toyAcc)

    // fixture keyword screen: must beat the majority class AND predict
    // both classes (a constant classifier fails one of the two)
    val fx = Tables.documents(spark, sf0001)
    val label = array_contains(
      graft.operators.TextOps.tokens(lower(col("text"))), "customer")
    val n = fx.count()
    val n1 = fx.filter(label).count()
    val majority = math.max(n1, n - n1) * 1000L / n
    val Array((nd, nc, acc)) = QualityModel.centroidEval(fx, "doc_id", "text", label)
      .as[(Long, Long, Long)].collect()
    assert(nd == n && acc > majority, s"acc=$acc majority=$majority")

    // the model table itself: all buckets present, fixed-point range
    val m = QualityModel.trainCentroid(fx, "doc_id", "text", label)
      .as[(Long, Long, Long)].collect()
    assert(m.length == QualityModel.TrainBuckets)
    assert(m.forall { case (_, c1, c0) =>
      c1 >= 0 && c1 <= QualityModel.WeightMicro &&
        c0 >= 0 && c0 <= QualityModel.WeightMicro })

    // single-class label is refused loudly, not trained into a 0-div
    intercept[IllegalArgumentException] {
      QualityModel.trainCentroid(fx, "doc_id", "text", lit(true))
    }
  }
}
