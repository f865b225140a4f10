package graft

import graft.operators.LabelProp

/** Label propagation: hand-traced rounds on a triangle + pair graph,
  * and the Spark-SQL replay of the oracle text on the corpus. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  test("label prop: triangle converges, disconnected pair oscillates deterministically") {
    // order 10 = basket {1,2,3} (a triangle), order 20 = basket {4,5}.
    // r1: 1→2 (tie min), 2→1, 3→1; pair swaps 4↔5.
    // r2: 1→1, 2→1 (tie min of {2:1,1:1}), 3→1; pair swaps back.
    // r3: all of {1,2,3} at 1; pair swaps again (bipartite oscillation
    // — the documented reason rounds are FIXED, not run to fixpoint).
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L), (20L, 5L))
      .toDF("l_orderkey", "l_partkey")
    val got = LabelProp.labelPropagate(li).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 5L, 5L -> 4L))
  }

  test("label prop: weight majority beats label count") {
    // node 1 has ONE heavy neighbor (2, w=3 via three shared orders)
    // and TWO light ones (3 and 4, w=1 each): after round 1, node 1
    // must take label 2 (weight 3 beats combined distinct labels).
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L), (5L, 1L), (5L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = LabelProp.labelPropagate(li, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 2L)
  }

  test("label prop: engine equals its own oracle text on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = LabelProp.qLabelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.sql(LabelProp.qLabelPropSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // communities actually merge: fewer labels than nodes
    assert(got.map(_._2).size < got.size)
  }
}
