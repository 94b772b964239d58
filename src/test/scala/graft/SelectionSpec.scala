package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("kthSmallest matches the sorted multiset on random longs (signed, dup-heavy)") {
    val rnd = new scala.util.Random(23)
    // full signed range + clustered duplicates (selection must count
    // multiplicity) + the extremes
    val vals = Seq.fill(400)(rnd.nextLong()) ++
      Seq.fill(100)(rnd.nextInt(5).toLong - 2) ++
      Seq(Long.MinValue, Long.MaxValue, 0L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (k <- Seq(1, 2, vals.length / 2, vals.length - 1, vals.length)) {
      val got = Selection.kthSmallest(df, "v", k.toLong)
      assert(got == sorted(k - 1), s"k=$k got=$got want=${sorted(k - 1)}")
    }
    intercept[IllegalArgumentException] {
      Selection.kthSmallest(df, "v", 0L)
    }
    intercept[IllegalArgumentException] {
      Selection.kthSmallest(df, "v", vals.length + 1L)
    }
  }

  test("medianReport: lower median, null values ignored, empty input empty") {
    val df = Seq(Some(5L), Some(1L), None, Some(3L), Some(9L))
      .toDF("v")
    val r = Selection.medianReport(df, "v")
      .as[(Long, Long, Long)].first()
    assert(r == ((4L, 2L, 3L)))   // sorted non-null = 1,3,5,9 -> k=2 -> 3
    assert(Selection.medianReport(
      Seq.empty[Long].toDF("v"), "v").count() == 0)
  }
}
