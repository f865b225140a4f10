package graft

import graft.operators.{AbTest, Chi2Assoc}

/** Cliff's delta and the χ²/Cramér-V association profile: hand-sized
  * frames with known closed forms — complete separation pins delta to
  * ±1 and 'large', identical arms to 0 and 'negligible'; an exactly
  * independent 2×2 grid pins χ² to 0, a diagonal one to n and V to 1. */
class EffectSizeSpec extends SparkSpec {
  import spark.implicits._

  test("cliffs delta: separation → ±1/large, identity → 0/negligible") {
    // arm 1 strictly above arm 0 for every pair
    val sep = Seq((1, 100L), (1, 90L), (0, 10L), (0, 5L), (0, 1L))
      .toDF("arm", "cents")
    val r = AbTest.cliffsDeltaFromPerUser(sep).collect().head
    assert(r.getLong(r.fieldIndex("delta_micro")) === 1000000L)
    assert(r.getString(r.fieldIndex("magnitude")) === "large")
    // identical multisets: every pair has a mirror, delta exactly 0
    val same = Seq((1, 5L), (1, 9L), (0, 5L), (0, 9L)).toDF("arm", "cents")
    val r2 = AbTest.cliffsDeltaFromPerUser(same).collect().head
    assert(r2.getLong(r2.fieldIndex("delta_micro")) === 0L)
    assert(r2.getString(r2.fieldIndex("magnitude")) === "negligible")
    // hand case with ties: t = {3,5}, c = {3,4}: pairs (3,3)=tie,
    // (3,4)<, (5,3)>, (5,4)> → delta = (2-1)/4 = 0.25, 'small'
    val hand = Seq((1, 3L), (1, 5L), (0, 3L), (0, 4L)).toDF("arm", "cents")
    val r3 = AbTest.cliffsDeltaFromPerUser(hand).collect().head
    assert(r3.getLong(r3.fieldIndex("delta_micro")) === 250000L)
    assert(r3.getString(r3.fieldIndex("magnitude")) === "small")
  }

  test("chi2: independence → 0; perfect diagonal → stat = n, V = 1") {
    // exactly independent 2×2: counts proportional to row*col products
    val ind = (Seq.fill(8)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
      Seq.fill(4)(("y", "u")) ++ Seq.fill(1)(("y", "v")))
      .toDF("a", "b")
    val r = Chi2Assoc.chi2(ind).collect().head
    assert(r.getLong(r.fieldIndex("stat_micro")) === 0L)
    assert(r.getLong(r.fieldIndex("v_micro")) === 0L)
    assert(r.getLong(r.fieldIndex("dof")) === 1L)
    // perfect association: χ² = n, V = 1
    val diag = (Seq.fill(3)(("x", "u")) ++ Seq.fill(5)(("y", "v")))
      .toDF("a", "b")
    val r2 = Chi2Assoc.chi2(diag).collect().head
    assert(r2.getLong(r2.fieldIndex("stat_micro")) === 8000000L)
    assert(r2.getLong(r2.fieldIndex("v_micro")) === 1000000L)
    // degenerate single-level column: dof 0, V pinned to 0, no NaN
    val one = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val r3 = Chi2Assoc.chi2(one).collect().head
    assert(r3.getLong(r3.fieldIndex("dof")) === 0L)
    assert(r3.getLong(r3.fieldIndex("v_micro")) === 0L)
  }
}
