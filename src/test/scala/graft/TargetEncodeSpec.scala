package graft

import graft.operators.TargetEncode

/** Target encoding: the distributed sufficient-stats formulation must
  * equal a driver-side leave-one-out recomputation, and the LOO
  * property itself (a singleton category encodes to the pure prior,
  * never its own label) must hold. */
class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticOrders = Seq(
    // (orderkey, custkey, priority, status): cust 1 has 3 orders (2 F),
    // cust 2 has 2 (0 F), cust 3 is a singleton with y=1 (leak bait)
    (1L, 1L, "1-URGENT", "F"), (2L, 1L, "2-HIGH", "F"),
    (3L, 1L, "1-URGENT", "O"), (4L, 2L, "2-HIGH", "O"),
    (5L, 2L, "3-MEDIUM", "P"), (6L, 3L, "1-URGENT", "F")
  ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")

  test("matches a driver-side LOO + m-prior recomputation") {
    val rows = syntheticOrders.select(
      "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")
      .as[(Long, Long, String, String)].collect()
    val m = TargetEncode.priorM.toDouble
    val ys = rows.map(r => (r._1, if (r._4 == "F") 1L else 0L)).toMap
    val gMean = ys.values.sum.toDouble / ys.size
    def loo(group: Seq[(Long, Long)]): Map[Long, Long] =
      group.map { case (ok, y) =>
        val sy = group.map(_._2).sum
        val n = group.size
        ok -> math.round(1e6 * ((sy - y + m * gMean) / (n - 1 + m)))
      }.toMap
    val byCust = rows.groupBy(_._2).flatMap { case (_, g) =>
      loo(g.map(r => (r._1, ys(r._1))).toSeq)
    }
    val byPrio = rows.groupBy(_._3).flatMap { case (_, g) =>
      loo(g.map(r => (r._1, ys(r._1))).toSeq)
    }
    val got = TargetEncode.encode(syntheticOrders).collect()
      .map(r => r.getLong(r.fieldIndex("o_orderkey")) ->
        ((r.getLong(r.fieldIndex("enc_cust_micro")),
          r.getLong(r.fieldIndex("enc_prio_micro"))))).toMap
    assert(got.keySet === rows.map(_._1).toSet)
    got.foreach { case (ok, (ec, ep)) =>
      assert(math.abs(ec - byCust(ok)) <= 1, s"cust enc for order $ok")
      assert(math.abs(ep - byPrio(ok)) <= 1, s"prio enc for order $ok")
    }
  }

  test("singleton category encodes to the pure global prior, not its label") {
    val out = TargetEncode.encode(syntheticOrders).collect()
      .map(r => r.getLong(r.fieldIndex("o_orderkey")) ->
        r.getLong(r.fieldIndex("enc_cust_micro"))).toMap
    // cust 3: n_c = 1, y = 1 -> (1 - 1 + m*gbar) / (0 + m) = gbar = 3/6
    assert(out(6L) === 500000L)
  }
}
