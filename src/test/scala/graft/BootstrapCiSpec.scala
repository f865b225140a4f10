package graft

import graft.ext.BootstrapCi

class BootstrapCiSpec extends SparkSpec {
  import spark.implicits._

  test("degenerate panel: identical queries give a zero-width CI") {
    val panel = (0L until 8L).map(q => (q, 0.5)).toDF("q_id", "m")
    val out = BootstrapCi.bootstrapCi(panel, Seq("m")).collect()
    assert(out.length === 1)
    val r = out.head
    // every resample sums 8 × 500000
    assert(r.getAs[Long]("observed_micro") === 4000000L)
    assert(r.getAs[Long]("lo_micro") === 4000000L)
    assert(r.getAs[Long]("med_micro") === 4000000L)
    assert(r.getAs[Long]("hi_micro") === 4000000L)
  }

  test("CI brackets the observed value and is ordered on a mixed panel") {
    val panel = (0L until 8L).map(q => (q, q / 10.0)).toDF("q_id", "m")
    val r = BootstrapCi.bootstrapCi(panel, Seq("m")).collect().head
    assert(r.getAs[Long]("lo_micro") <= r.getAs[Long]("med_micro"))
    assert(r.getAs[Long]("med_micro") <= r.getAs[Long]("hi_micro"))
    // lo/hi must be achievable resample totals: within [8·min, 8·max]
    assert(r.getAs[Long]("lo_micro") >= 0L)
    assert(r.getAs[Long]("hi_micro") <= 8L * 700000L)
    // a non-degenerate panel yields a non-degenerate interval
    assert(r.getAs[Long]("lo_micro") < r.getAs[Long]("hi_micro"))
  }

  test("resampling is seeded: identical CIs on re-run") {
    val panel = (0L until 8L).map(q => (q, q / 7.0)).toDF("q_id", "m")
    val a = BootstrapCi.bootstrapCi(panel, Seq("m")).collect().head.toString
    val b = BootstrapCi.bootstrapCi(panel, Seq("m")).collect().head.toString
    assert(a === b)
  }

  test("driver query: three metric rows with bracketed intervals") {
    val out = BootstrapCi.qBootstrapCi(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(_.getAs[String]("metric")).toSeq ===
      Seq("mrr", "ndcg", "recall_at_k"))
    out.foreach { r =>
      assert(r.getAs[Long]("lo_micro") <= r.getAs[Long]("med_micro"))
      assert(r.getAs[Long]("med_micro") <= r.getAs[Long]("hi_micro"))
    }
  }
}
