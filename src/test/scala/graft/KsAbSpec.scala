package graft

import graft.operators.KsAb

/** Two-sample KS: identical multisets pin D to exactly 0; fully
  * separated supports pin D to exactly 1; a hand frame reproduces
  * the exact cross-multiplied sup gap; the store view equals batch
  * (covered by ExperimentStoreSpec's row). */
class KsAbSpec extends SparkSpec {
  import spark.implicits._

  test("identical → D 0; separated → D 1; hand case exact") {
    def pu(t: Seq[Long], c: Seq[Long]) =
      (t.map((1, _)) ++ c.map((0, _))).toDF("arm", "cents")
    val same = KsAb.ksFromPerUser(
      pu(Seq(1, 2, 3, 4), Seq(1, 2, 3, 4))).collect().head
    assert(same.getLong(same.fieldIndex("d_micro")) === 0L)
    assert(!same.getBoolean(same.fieldIndex("significant")))
    val sep = KsAb.ksFromPerUser(
      pu(Seq(10, 11, 12), Seq(1, 2, 3))).collect().head
    assert(sep.getLong(sep.fieldIndex("d_micro")) === 1000000L)
    // hand: t = {1,2,2,5}, c = {2,3}: CDF gap max at x=2:
    // F_t(2) = 3/4, F_c(2) = 1/2 → D = 1/4... check all points:
    // x=1: 1/4 vs 0 → .25; x=2: .75 vs .5 → .25; x=3: .75 vs 1 → .25;
    // x=5: 1 vs 1 → 0. D = 0.25
    val hand = KsAb.ksFromPerUser(
      pu(Seq(1, 2, 2, 5), Seq(2, 3))).collect().head
    assert(hand.getLong(hand.fieldIndex("d_micro")) === 250000L)
    // fence replay
    assert(hand.getLong(hand.fieldIndex("fence_micro")) ===
      math.round(1.358 * math.sqrt(6.0 / 8.0) * 1e6))
  }
}
