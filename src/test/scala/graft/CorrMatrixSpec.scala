package graft

import graft.operators.CorrMatrix

/** Correlation matrix: values agree with Spark's own corr() on the
  * real data (the engine's exact-sufficient-statistics formulation vs
  * the built-in Welford fold), bounds hold, and the plan is one scan. */
class CorrMatrixSpec extends SparkSpec {

  test("matches Spark's corr() within float tolerance; |r| <= 1") {
    val dir = "/root/testdata/sf0.001"
    val out = CorrMatrix.qCorrMatrix(spark, dir).collect()
    assert(out.length === 6)
    val li = Tables(spark, dir, "lineitem")
    out.foreach { row =>
      val (x, y, r) = (row.getString(0), row.getString(1), row.getDouble(3))
      assert(math.abs(r) <= 1.0 + 1e-12)
      val ref = li.select(org.apache.spark.sql.functions.corr(x, y))
        .head().getDouble(0)
      // corr() is a float fold on raw doubles; the engine works on
      // exact centi-unit statistics — agreement to ~1e-9 is the
      // expected envelope between the two
      assert(math.abs(r - ref) < 1e-6, s"$x~$y: $r vs corr()=$ref")
    }
  }

  test("plan: one scan of lineitem (single aggregate, no join)") {
    val plan = CorrMatrix.qCorrMatrix(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(300))
    // one file scan feeds the whole statistic
    assert("FileScan parquet".r.findAllIn(plan).length === 1)
  }
}
