package graft

import graft.operators.Autocorr

/** ACF: an alternating series autocorrelates perfectly at even lags
  * and anti-correlates at odd lags; spine gaps are true zeros; pair
  * counts shrink by exactly one per lag. */
class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  test("alternating series: r(even) = 1, r(odd) = -1") {
    // 0,4,0,4,... over 40 hours
    val counts = (0L until 40L).map(h => (h, if (h % 2 == 0) 0L else 4L))
      .toDF("h", "c")
    val out = Autocorr.acf(counts, maxL = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(math.abs(out(2L)._2 - 1.0) < 1e-12)
    assert(math.abs(out(4L)._2 - 1.0) < 1e-12)
    assert(math.abs(out(1L)._2 + 1.0) < 1e-12)
    assert(math.abs(out(3L)._2 + 1.0) < 1e-12)
    // n = |spine| - lag
    assert(out(1L)._1 === 39L && out(4L)._1 === 36L)
  }

  test("missing hours enter the spine as zeros, not dropped rows") {
    // only odd hours present with c=4: spine densifies to the same
    // alternating series as above
    val sparse = (0L until 40L).filter(_ % 2 == 1).map(h => (h, 4L))
      .toDF("h", "c")
    val out = Autocorr.acf(sparse, maxL = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // spine starts at h=1 (min) so it is 4,0,4,0,… — still period 2
    assert(math.abs(out(2L) - 1.0) < 1e-12)
    assert(math.abs(out(1L) + 1.0) < 1e-12)
  }

  test("driver query: 24 lags, every r in [-1, 1]") {
    val rows = Autocorr.qAcf(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 24)
    assert(rows.forall { r =>
      val v = r.getDouble(2); !v.isNaN && v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9
    })
  }
}
