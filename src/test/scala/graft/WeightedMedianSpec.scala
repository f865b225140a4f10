package graft

import graft.operators.WeightedMedian

/** Weighted median: hand cases (weight dominance, ties, single value)
  * and the bucketed plan vs the global-cumsum oracle on the corpus. */
class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  test("weight dominance: a heavy value IS the median regardless of count") {
    // values 1..99 at weight 1 each (mass 99), value 1000 at weight 200:
    // total 299, target 150 → the heavy value carries the crossing
    val vw = ((1L to 99L).map(v => (v, 1L)) :+ (1000L, 200L))
      .toDF("v", "w")
    val r = WeightedMedian.weightedMedian(vw).head
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 299L)
  }

  test("unit weights degrade to the plain lower median") {
    // 1..10 weight 1: target ⌈10/2⌉ = 5 → median 5 (lower median)
    val vw = (1L to 10L).map(v => (v, 1L)).toDF("v", "w")
    assert(WeightedMedian.weightedMedian(vw).head.getLong(0) === 5L)
  }

  test("duplicate values accumulate weight before the crossing test") {
    // v=7 three times at weight 2 (mass 6), v=9 weight 5: total 11,
    // target 6 → v=7 crosses exactly at its accumulated mass
    val vw = Seq((7L, 2L), (7L, 2L), (7L, 2L), (9L, 5L)).toDF("v", "w")
    val r = WeightedMedian.weightedMedian(vw).head
    assert(r.getLong(0) === 7L && r.getLong(2) === 6L)
  }

  test("corpus: bucketed two-phase equals the global-cumsum oracle") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = WeightedMedian.qWeightedMedian(spark, dir).head
    val want = spark.sql(
      WeightedMedian.qWeightedMedianSql.replace("//", "div")).head
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getLong(1) === want.getLong(1))
    assert(got.getLong(2) === want.getLong(2))
  }
}
