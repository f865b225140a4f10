package graft

import graft.operators.{AbTest, TailRisk}

/** Exact VaR/CVaR: brute-force replay of the order statistic and the
  * tie-split tail mean. */
class TailRiskSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("VaR is the m-th largest, CVaR splits the boundary tie group exactly") {
    val cents = AbTest.perUserArm(Tables(spark, dir, "events"))
      .select("cents").collect().map(_.getLong(0)).sorted(
        Ordering[Long].reverse)
    val n = cents.length.toLong
    val m = n - (n * 95) / 100
    val varC = cents(m.toInt - 1)
    val tailSum = cents.take(m.toInt).sum
    val out = TailRisk.qTailRisk(spark, dir).head
    assert(out.getAs[Long]("n_users") === n)
    assert(out.getAs[Long]("tail_n") === m)
    assert(out.getAs[Long]("var_cents") === varC)
    assert(out.getAs[Long]("tail_sum_cents") === tailSum)
    assert(out.getAs[Long]("cvar_cents_micro") ===
      math.round(1e6 * tailSum.toDouble / m))
    // CVaR dominates VaR (coherence sanity)
    assert(out.getAs[Long]("cvar_cents_micro") >= varC * 1000000L)
  }
}
