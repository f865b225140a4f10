package graft

import graft.operators.DpRelease

class DpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def dims(ks: Long*) =
    ks.map(k => (k, s"g$k")).toDF("k", "name")

  test("true aggregates are exact and the ledger is the composed eps") {
    val rows = Seq((0L, 100L), (0L, 200L), (1L, 50L)).toDF("k", "cents")
    val out = DpRelease.dpRelease(rows, dims(0L, 1L)).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(0L).getAs[Long]("n_true") === 2L)
    assert(out(0L).getAs[Long]("sum_true_cents") === 300L)
    assert(out(1L).getAs[Long]("n_true") === 1L)
    assert(out.values.forall(
      _.getAs[Long]("eps_total_micro") ===
        DpRelease.epsCountMicro + DpRelease.epsSumMicro))
  }

  test("clipping bounds each row's contribution at the ceiling") {
    // one huge row and one negative row: clipped to [0, clipCents]
    val rows = Seq((0L, DpRelease.clipCents * 100), (0L, -500L))
      .toDF("k", "cents")
    val r = DpRelease.dpRelease(rows, dims(0L)).collect().head
    assert(r.getAs[Long]("sum_true_cents") === DpRelease.clipCents)
  }

  test("the release is replayable: identical numbers on re-run") {
    val rows = (0 until 100).map(i => (i.toLong % 5, i.toLong * 10))
      .toDF("k", "cents")
    val d = dims(0L, 1L, 2L, 3L, 4L)
    val a = DpRelease.dpRelease(rows, d).collect().sortBy(_.getAs[Long]("k"))
    val b = DpRelease.dpRelease(rows, d).collect().sortBy(_.getAs[Long]("k"))
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("noise magnitude respects the inverse-CDF tail bound") {
    // |count noise| <= b * ln(2^32) ~ 89; |sum noise| <= bSum * 22.2
    val rows = (0 until 50).map(i => (i.toLong % 10, 100L)).toDF("k", "cents")
    val out = DpRelease.dpRelease(rows, dims((0L until 10L): _*)).collect()
    out.foreach { r =>
      val dn = math.abs(r.getAs[Long]("n_released") - r.getAs[Long]("n_true"))
      assert(dn <= 100L, s"count noise $dn out of tail bound")
      val ds = math.abs(
        r.getAs[Long]("sum_released_cents") - r.getAs[Long]("sum_true_cents"))
      assert(ds <= 100000000L, s"sum noise $ds out of tail bound")
    }
    // seeded noise is not identically zero across 10 groups
    assert(out.exists(r =>
      r.getAs[Long]("n_released") !== r.getAs[Long]("n_true")))
  }

  test("driver query: one row per nation with names attached") {
    val out = DpRelease.qDpCounts(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 25)
    assert(out.forall(_.getAs[String]("name").nonEmpty))
  }
}
