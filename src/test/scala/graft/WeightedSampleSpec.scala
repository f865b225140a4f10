package graft

import graft.operators.WeightedSample

/** Weighted sampler: pairwise odds ∝ weight (statistical check over
  * the deterministic hash population), determinism, the weight cap,
  * and the TakeOrdered plan. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("inclusion rate tracks weight (w=4 vs w=1 over 4000 items)") {
    // 2000 items at weight 1, 2000 at weight 4 — a k=400 draw should
    // pick w=4 items at ~4x the rate of w=1 (binomial noise bounded)
    val items = ((1L to 2000L).map(i => (i, 1L)) ++
      (2001L to 4000L).map(i => (i, 4L))).toDF("id", "w")
    val picked = WeightedSample.weightedSample(items, k = 400)
      .collect().map(_.getLong(0))
    val heavy = picked.count(_ > 2000L)
    // expected heavy share 4/5 = 320; 3-sigma ≈ 24
    assert(heavy > 320 - 75 && heavy < 320 + 75, s"heavy=$heavy")
    assert(picked.distinct.length === 400) // without replacement
  }

  test("deterministic: same draw twice; cap saturates extreme weights") {
    val items = (1L to 500L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val a = WeightedSample.weightedSample(items, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val b = WeightedSample.weightedSample(items, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(a.toSeq === b.toSeq)
    // a weight beyond the cap behaves as the cap (same replicas)
    val big = Seq((1L, 1000L)).toDF("id", "w")
    val capped = Seq((1L, WeightedSample.maxWeight.toLong)).toDF("id", "w")
    assert(WeightedSample.weightedSample(big, 1).collect().head.getLong(2)
      === WeightedSample.weightedSample(capped, 1).collect().head.getLong(2))
  }

  test("plan: global top-k is TakeOrdered, not a global sort") {
    val items = (1L to 1000L).map(i => (i, 2L)).toDF("id", "w")
    val plan = WeightedSample.weightedSample(items, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }
}
