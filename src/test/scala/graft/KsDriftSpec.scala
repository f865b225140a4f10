package graft

import graft.operators.KsDrift

class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  private def feat(rows: Seq[(String, Long)]) = rows.toDF("side", "cents")

  test("identical samples score D = 0 and don't alarm") {
    val rows = (0 until 100).flatMap { i =>
      Seq(("ref", i.toLong * 7), ("cur", i.toLong * 7))
    }
    val out = KsDrift.ksDrift(feat(rows)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_ref") === 100L)
    assert(r.getAs[Long]("n_cur") === 100L)
    assert(r.getAs[Long]("ks_micro") === 0L)
    assert(r.getAs[Int]("drifted") === 0)
  }

  test("disjoint supports score D = 1 at the ref maximum") {
    // ref in [0,50), cur in [100,150): D = 1 attained at ref's top value
    val rows = (0 until 50).map(i => ("ref", i.toLong)) ++
      (0 until 50).map(i => ("cur", 100L + i))
    val r = KsDrift.ksDrift(feat(rows)).collect().head
    assert(r.getAs[Long]("ks_micro") === 1000000L)
    assert(r.getAs[Int]("drifted") === 1)
    assert(r.getAs[Long]("at_cents") === 49L) // smallest argmax value
  }

  test("hand-computed D on a small mixed sample") {
    // ref = {1,2,3,4}, cur = {3,4,5,6}: D = 1/2 at x = 2 (2/4 vs 0/4)
    val rows = Seq(1L, 2L, 3L, 4L).map(("ref", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("cur", _))
    val r = KsDrift.ksDrift(feat(rows)).collect().head
    assert(r.getAs[Long]("ks_micro") === 500000L)
    assert(r.getAs[Long]("at_cents") === 2L)
    assert(r.getAs[Int]("drifted") === 1)
  }

  test("unbalanced sample sizes stay exact") {
    // ref = {0..9} (n=10), cur = {0..4} each twice (n=10) → CDFs agree
    // below 5; at 4: 5/10 vs 10/10 → D = 1/2… check exact: at x=4
    // F_ref=5/10, F_cur=10/10 → gap 1/2; argmax at 4
    val rows = (0 until 10).map(i => ("ref", i.toLong)) ++
      (0 until 5).flatMap(i => Seq(("cur", i.toLong), ("cur", i.toLong)))
    val r = KsDrift.ksDrift(feat(rows)).collect().head
    assert(r.getAs[Long]("ks_micro") === 500000L)
    assert(r.getAs[Long]("at_cents") === 4L)
  }

  test("a small shift below the alarm line does not alarm") {
    // 5% of cur mass moved beyond ref's support → D = 0.05 < 0.1
    val rows = (0 until 100).flatMap { i =>
      Seq(("ref", i.toLong), ("cur", if (i < 95) i.toLong else 1000L + i))
    }
    val r = KsDrift.ksDrift(feat(rows)).collect().head
    assert(r.getAs[Long]("ks_micro") === 50000L)
    assert(r.getAs[Int]("drifted") === 0)
  }

  test("driver query runs on testdata and returns one row") {
    val out = graft.operators.KsDrift.qKsDrift(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_ref") > 0L)
    assert(rows.head.getAs[Long]("n_cur") > 0L)
  }
}
