package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Integer PageRank: hand-computed ranks on a tiny star graph, the
  * Spark-SQL replay of the oracle text on the corpus, and mass sanity. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand-computed star graph") {
    // one order {1,2}, one order {1,3}: edges 1↔2 (w1), 1↔3 (w1);
    // out: 1→2, 2→1, 3→1. n=3, M=1e12: r0 = 333333333333 each,
    // base = 50000000000.
    // round 1: node1 gets from 2 (850·r·1 div 1000·1) + from 3 (same)
    //   = 2·283333333333 = 566666666666 + base = 616666666666
    // node2 gets from 1: (850·333333333333·1) div (1000·2)
    //   = 141666666666 + base = 191666666666; node3 identical.
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val r1 = PageRank.pagerank(li, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) === 616666666666L)
    assert(r1(2L) === 191666666666L)
    assert(r1(3L) === 191666666666L)
    // round 2 conserves the hub ordering and approximate mass
    val r2 = PageRank.pagerank(li, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(1L) > r2(2L) && r2(2L) === r2(3L))
    assert(math.abs(r2.values.sum - PageRank.prMass) < 10L)
  }

  test("pagerank: engine equals its own oracle text on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = PageRank.qPagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // DuckDB `//` is `div` in Spark SQL; everything else is shared ANSI
    val sql = PageRank.qPagerankSql.replace(" // ", " div ")
    val want = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("pagerank: mass approximately conserved, truncation-only loss") {
    val dir = "/root/testdata/sf0.001"
    val r = PageRank.qPagerank(spark, dir)
      .agg(sum(col("rank")), count(lit(1))).head
    val (total, n) = (r.getLong(0), r.getLong(1))
    // each node's base and each edge contribution truncate: loss is
    // bounded by (n + edges) units out of 1e12 — far under 0.1%
    assert(total <= PageRank.prMass)
    assert(total > PageRank.prMass * 999 / 1000)
    assert(n > 0)
  }
}
