package graft

import graft.operators.KCore

/** k-core: a triangle survives 2-core peeling while its pendant chain
  * cascades away; the fixed round budget covers convergence on the
  * testdata (one extra round is a no-op); every surviving degree ≥ k. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("triangle + pendant chain: chain cascades away over rounds") {
    // 1-2-3 triangle; chain 3-4-5-6 (each chain node deg ≤ 2 but the
    // tail unravels one round at a time — the cascade the budget covers)
    val edges = undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)))
    val core = KCore.kcore(edges, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet === Set(1L, 2L, 3L))
    assert(core.values.forall(_ === 2L))
    // an insufficient budget leaves the cascade mid-peel — showing the
    // rounds actually do one peel each, not a fixpoint in disguise
    val partial = KCore.kcore(edges, k = 2, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(partial.contains(5L) && !partial.contains(6L))
  }

  test("budget covers convergence on testdata; all degrees ≥ k") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val edges = KCore.supportEdges(li)
    val atBudget = KCore.kcore(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePast = KCore.kcore(edges, rounds = KCore.peelRounds + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atBudget === onePast)
    assert(atBudget.forall(_._2 >= KCore.coreK))
  }
}
