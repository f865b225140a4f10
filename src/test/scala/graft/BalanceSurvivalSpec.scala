package graft

import graft.operators.{CovariateBalance, KaplanMeier, MedianSurvival}
import graft.ext.Ess

/** Covariate balance, survival quantiles, ESS: identical arms pin
  * SMD to exactly 0; a location-shifted covariate reproduces the
  * hand SMD; the KM quantile probe finds the first crossing and
  * surfaces never-crossed as NULL+false; uniform weights pin
  * ESS/n = 1, one-hot weights pin ESS = 1. */
class BalanceSurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("balance: mirrored arms → SMD exactly 0; shifted → hand value") {
    val pu = (Seq((1, 10L, 100L, 20L), (1, 20L, 200L, 30L)) ++
      Seq((0, 10L, 100L, 20L), (0, 20L, 200L, 30L)))
      .toDF("arm", "nonpurchases", "cents", "n_events")
    val out = CovariateBalance.balanceFromPerUser(pu).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("smd_micro")) === 0L)
      assert(r.getBoolean(r.fieldIndex("balanced")))
    }
    // shift the treated cents by +10: m diff 10, pooled sd = sd of
    // {100,200} = 50√2 → SMD = 10/(50√2)
    val sh = (Seq((1, 10L, 110L, 20L), (1, 20L, 210L, 30L)) ++
      Seq((0, 10L, 100L, 20L), (0, 20L, 200L, 30L)))
      .toDF("arm", "nonpurchases", "cents", "n_events")
    val cents = CovariateBalance.balanceFromPerUser(sh)
      .filter($"covariate" === "cents").collect().head
    val sd2 = 5000.0 // per-arm sample variance of {±50 around mean}
    val want = math.round(1e6 * 10.0 / math.sqrt((sd2 + sd2) / 2))
    assert(cents.getLong(cents.fieldIndex("smd_micro")) === want)
  }

  test("survival quantiles: first crossing per q; never-crossed NULL") {
    val day = 86400000000L
    // 4 subjects all event at days 1,2,3,4 → S = .75,.5,.25,0
    val rows = (1 to 4).map(d =>
      (0L, 9 * day, Option(d * day + 1))).toSeq
    val df = rows.map { case (f, l, p) =>
      (f, l, p.map(java.lang.Long.valueOf).orNull)
    }.toDF("f_us", "l_us", "p_us")
      .selectExpr("f_us", "l_us", "cast(p_us as bigint) as p_us")
    val out = MedianSurvival.survivalQuantiles(df)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getBoolean(2)))
    assert(out.toSeq === Seq((750000L, 1L, true), (500000L, 2L, true),
      (250000L, 3L, true)))
    // all censored: S never drops → every quantile unreached
    val cen = Seq((0L, 9 * day, null.asInstanceOf[java.lang.Long]))
      .toDF("f_us", "l_us", "p_us")
      .selectExpr("f_us", "l_us", "cast(p_us as bigint) as p_us")
    val out2 = MedianSurvival.survivalQuantiles(cen).collect()
    assert(out2.forall(r => r.isNullAt(1) && !r.getBoolean(2)))
  }

  test("ess: uniform weights → ESS = n; one dominant weight → ESS ≈ 1") {
    val uni = (1L to 50L).map(i => i -> 0L).toDF("doc_id", "logw_micro")
    val r = Ess.essFromWeights(uni).collect().head
    assert(r.getLong(r.fieldIndex("ess_micro")) === 50000000L)
    assert(r.getLong(r.fieldIndex("ess_frac_micro")) === 1000000L)
    assert(!r.getBoolean(r.fieldIndex("collapsed")))
    // one weight e^20 above the rest: the rest quantize to zero mass
    val dom = ((1L to 49L).map(i => i -> 0L) :+ (50L -> 20000000L))
      .toDF("doc_id", "logw_micro")
    val r2 = Ess.essFromWeights(dom).collect().head
    assert(r2.getLong(r2.fieldIndex("ess_micro")) === 1000000L)
    assert(r2.getBoolean(r2.fieldIndex("collapsed")))
  }
}
