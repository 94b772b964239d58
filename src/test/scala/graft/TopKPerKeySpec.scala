package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowReference(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("topk_rank", row_number().over(w).cast("long"))
      .filter(col("topk_rank") <= k)
  }

  test("physical grouped top-k equals the window spelling on the fixture") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    for (k <- Seq(1, 3, 7)) {
      val got = TopKPerKey.topKPerKey(docs, Seq("source"),
        Seq("n_chars" -> false, "doc_id" -> true), k)
        .as[(Long, String, Long, Long)].collect().toSet
      val want = windowReference(k)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want, s"k=$k: ${got.size} vs ${want.size}")
    }
  }

  test("physical grouped top-k equals the window spelling on seeded random data") {
    val rnd = new scala.util.Random(17)
    // duplicate sort values force the tie-break; tiny groups force k > group size
    val rows = (1L to 3000L).map(i => (i, s"g${rnd.nextInt(40)}", rnd.nextInt(25).toLong))
    val df = rows.toDF("id", "g", "v")
    val got = TopKPerKey.topKPerKey(df, Seq("g"),
      Seq("v" -> false, "id" -> true), 5, rankName = "r")
      .as[(Long, String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= 5).as[(Long, String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("plans as the partial/final exec pair with one exchange and no window sort") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val df = TopKPerKey.topKPerKey(docs, Seq("source"),
      Seq("n_chars" -> false, "doc_id" -> true), 3)
    df.collect()
    // final adaptive section only (the pre-execution tree rides along
    // after "== Initial Plan ==" and would double every count)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // physical nodes print without the Exec suffix: two passes (partial +
    // final) around exactly one exchange, no window and no sort anywhere
    assert(plan.linesIterator.count(_.contains("TopKPerKey ")) == 2, plan)
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
  }

  test("bad configuration fails loudly") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source")
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(docs, Seq("source"), Seq("doc_id" -> true), 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(docs, Seq("nope"), Seq("doc_id" -> true), 1)
    }
  }
}
