package graft

import graft.operators.ShortestPath

/** Weighted shortest path: the cheaper-via-more-hops case BFS cannot
  * express, bounded-horizon semantics, and the unrolled min-plus
  * oracle on the corpus. */
class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  test("a strong 2-hop route undercuts a weak direct edge") {
    // 1→3 direct with w=1 (cost 1_000_000); 1→2→3 with w=100 each
    // (cost 10_000 + 10_000 = 20_000): node 3's cost must IMPROVE
    // past its first-reached value
    val edges = Seq(
      (1L, 3L, 1L), (1L, 2L, 100L), (2L, 3L, 100L))
      .toDF("src", "dst", "w")
    val got = ShortestPath.shortestPath(edges, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 10000L, 3L -> 20000L))
  }

  test("bounded horizon: a cheaper 4-hop route is NOT seen at 3 hops") {
    // chain 1→2→3→4→5 all w=1000 (cost 1000 each); plus direct 1→5
    // w=1 (cost 1_000_000). At 3 hops the chain reaches only node 4,
    // so node 5 keeps the expensive direct edge.
    val edges = Seq(
      (1L, 2L, 1000L), (2L, 3L, 1000L), (3L, 4L, 1000L),
      (4L, 5L, 1000L), (1L, 5L, 1L))
      .toDF("src", "dst", "w")
    val got = ShortestPath.shortestPath(edges, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) === 1000000L)
    assert(got(4L) === 3000L)
  }

  test("corpus: relaxation equals the unrolled min-plus oracle") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = ShortestPath.qShortestPath(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.sql(
      ShortestPath.qShortestPathSql.replace("//", "div")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
