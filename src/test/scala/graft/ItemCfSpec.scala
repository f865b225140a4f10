package graft

import graft.operators.ItemCf

/** Item-item CF: hand-computed cosines on known baskets, the support
  * floor, symmetry, and rank ordering. */
class ItemCfSpec extends SparkSpec {
  import spark.implicits._

  test("cosines match hand computation; sub-support pairs dropped") {
    // baskets: {1,2} ×2, {1,2,3}, {1,3}
    // f(1)=4, f(2)=3, f(3)=2; co(1,2)=3, co(1,3)=2, co(2,3)=1 (< 2 → out)
    val basket = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 3L)).toDF("ok", "item")
    val out = ItemCf.itemCf(basket).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out.keySet ===
      Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))) // (2,3) under support
    val (co12, cos12, _) = out((1L, 2L))
    assert(co12 === 3L)
    assert(math.abs(cos12 - 3.0 / math.sqrt(12.0)) < 1e-15)
    assert(out((2L, 1L))._2 === cos12) // symmetric score
    val (co13, cos13, _) = out((1L, 3L))
    assert(co13 === 2L && math.abs(cos13 - 2.0 / math.sqrt(8.0)) < 1e-15)
    // per-item ranking: item 1's better neighbor is 2 (0.866 > 0.707)
    assert(out((1L, 2L))._3 === 1L && out((1L, 3L))._3 === 2L)
  }

  test("duplicate lineitem rows do not inflate co-occurrence") {
    // same item twice in one basket counts once
    val basket = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
      .toDF("ok", "item")
    val out = ItemCf.itemCf(basket).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) === 2L)
  }

  test("driver query: top-5 cap and deterministic rank ties") {
    val rows = ItemCf.qItemCf(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byItem = rows.groupBy(_.getLong(0))
    assert(byItem.values.forall(_.length <= ItemCf.topN))
    byItem.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(4))
      // ranks are 1..m and cosine non-increasing along them
      assert(sorted.map(_.getLong(4)).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3)
        case _ => true
      })
    }
  }
}
