package graft

import graft.operators.Cuped

/** CUPED: the distributed sufficient-stats readout must equal a
  * driver-side recomputation, show real variance reduction on a
  * corpus where the covariate predicts spend, and degrade exactly to
  * the raw Welch test when the covariate carries no variance. */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  // user u: x_u = (u % 10) + 1 click events, spend = 200·x_u + (u % 7)
  // cents across convMin purchases -> spend is almost a deterministic
  // function of the covariate (rho^2 near 1)
  private def correlatedEvents(n: Long) = {
    val rows = (0L until n).flatMap { u =>
      val x = (u % 10 + 1).toInt
      val cents = 200L * x + (u % 7)
      Seq.fill(x)((u, "click", 0.0)) ++
        Seq((u, "purchase", cents / 100.0)) ++
        Seq.fill(13)((u, "purchase", 0.0))
    }
    rows.toDF("user_id", "event_type", "value")
  }

  test("matches a driver-side recomputation; high rho2 on planted corpus") {
    val ev = correlatedEvents(300)
    val pu = Cuped.perUser(ev).select("arm", "x", "y")
      .as[(Long, Long, Long)].collect()
    val t = pu.filter(_._1 == 1).map(r => (r._2, r._3))
    val c = pu.filter(_._1 == 0).map(r => (r._2, r._3))
    val all = t ++ c
    val nn = all.length.toDouble
    val (sx, sy) = (all.map(_._1).sum.toDouble, all.map(_._2).sum.toDouble)
    val sxx = all.map(r => r._1.toDouble * r._1).sum
    val syy = all.map(r => r._2.toDouble * r._2).sum
    val sxy = all.map(r => r._1.toDouble * r._2).sum
    val vx = nn * sxx - sx * sx
    val vy = nn * syy - sy * sy
    val cxy = nn * sxy - sx * sy
    val theta = cxy / vx
    val rho2 = cxy * cxy / (vx * vy)
    def s2(g: Array[(Long, Long)]): Double = {
      val n = g.length.toDouble
      val (gx, gy) = (g.map(_._1).sum.toDouble, g.map(_._2).sum.toDouble)
      val gxx = g.map(r => r._1.toDouble * r._1).sum
      val gyy = g.map(r => r._2.toDouble * r._2).sum
      val gxy = g.map(r => r._1.toDouble * r._2).sum
      ((n * gyy - gy * gy) - 2.0 * theta * (n * gxy - gx * gy)
        + theta * theta * (n * gxx - gx * gx)) / (n * n * (n - 1))
    }
    val effAdj = (t.map(_._2).sum.toDouble / t.length
      - c.map(_._2).sum.toDouble / c.length) -
      theta * (t.map(_._1).sum.toDouble / t.length
        - c.map(_._1).sum.toDouble / c.length)
    val tAdj = effAdj / math.sqrt(s2(t) + s2(c))

    val out = Cuped.cuped(ev).collect().head
    assert(out.getLong(out.fieldIndex("n_t")) === t.length.toLong)
    assert(out.getLong(out.fieldIndex("n_c")) === c.length.toLong)
    // same formulas, different path: allow 1-unit double-rounding slack
    assert(math.abs(out.getLong(out.fieldIndex("theta_micro"))
      - math.round(1e6 * theta)) <= 1)
    assert(math.abs(out.getLong(out.fieldIndex("rho2_micro"))
      - math.round(1e6 * rho2)) <= 1)
    assert(math.abs(out.getLong(out.fieldIndex("t_adj_micro"))
      - math.round(1e6 * tAdj)) <= 1)
    // the planted corpus: covariate explains nearly all spend variance
    assert(out.getLong(out.fieldIndex("rho2_micro")) >= 900000L)
  }

  test("zero-variance covariate: theta = 0 and t_adj degrades to raw t") {
    // every user has exactly 3 clicks -> var(X) = 0 within and across arms
    val ev = (0L until 100L).flatMap { u =>
      Seq.fill(3)((u, "click", 0.0)) ++
        Seq.fill(14)((u, "purchase", (u % 5 + 1) * 1.0))
    }.toDF("user_id", "event_type", "value")
    val out = Cuped.cuped(ev).collect().head
    assert(out.getLong(out.fieldIndex("theta_micro")) === 0L)
    assert(out.getLong(out.fieldIndex("t_adj_micro")) ===
      out.getLong(out.fieldIndex("t_micro")))
    assert(out.getLong(out.fieldIndex("rho2_micro")) === 0L)
  }
}
