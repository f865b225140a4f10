package graft

import graft.operators.RateRatio

/** Poisson rate ratio: equal rates pin IRR to exactly 1 and z to 0;
  * a doubled rate reproduces the hand IRR/z; zero-count arms surface
  * as undefined rather than a fudged value. */
class RateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def pu(t: Seq[Long], c: Seq[Long]) =
    (t.map((1, _)) ++ c.map((0, _))).toDF("arm", "purchases")

  test("equal rates → IRR 1, z 0; doubled rate → hand values") {
    val eq = RateRatio.rateFromPerUser(
      pu(Seq.fill(20)(3L), Seq.fill(20)(3L))).collect().head
    assert(eq.getLong(eq.fieldIndex("irr_micro")) === 1000000L)
    assert(eq.getLong(eq.fieldIndex("z_micro")) === 0L)
    assert(!eq.getBoolean(eq.fieldIndex("significant")))
    // t: 20 users × 6; c: 20 users × 3 → IRR = 2
    val dbl = RateRatio.rateFromPerUser(
      pu(Seq.fill(20)(6L), Seq.fill(20)(3L))).collect().head
    assert(dbl.getLong(dbl.fieldIndex("irr_micro")) === 2000000L)
    val z = math.round(1e6 * math.log(2.0) /
      math.sqrt(1.0 / 120 + 1.0 / 60))
    assert(dbl.getLong(dbl.fieldIndex("z_micro")) === z)
    assert(dbl.getBoolean(dbl.fieldIndex("significant")))
  }

  test("zero-count arm → undefined, never a fudge") {
    val r = RateRatio.rateFromPerUser(
      pu(Seq.fill(10)(0L), Seq.fill(10)(3L))).collect().head
    assert(!r.getBoolean(r.fieldIndex("irr_defined")))
    assert(r.getLong(r.fieldIndex("irr_micro")) === 0L)
    assert(!r.getBoolean(r.fieldIndex("significant")))
  }
}
