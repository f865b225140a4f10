package graft

import graft.operators.Bfs
import org.apache.spark.sql.functions._

/** BFS: hand-built path/branch graphs (distance minimality, unreached
  * nodes absent, hop cap) and the frontier plan vs the unrolled
  * set-algebra oracle on the corpus graph. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .toDF("src", "dst")

  test("bfs: path graph distances, nodes beyond the cap absent") {
    // 1-2-3-4-5, seed {1}: dist 1→0, 2→1, 3→2, 4→3; 5 is 4 hops — absent
    val e = edgesOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Bfs.bfs(e, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfs: multi-source takes the MINIMUM distance over seeds") {
    // 1-2-3-4-5 with seeds {1,5}: 3 is 2 hops from both; 2→1 via 1, 4→1 via 5
    val e = edgesOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Bfs.bfs(e, Seq(1L, 5L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfs: cycle does not re-enter reached nodes") {
    // triangle 1-2-3, seed {1}: 2 and 3 both distance 1, never 2
    val e = edgesOf((1L, 2L), (2L, 3L), (3L, 1L))
    val got = Bfs.bfs(e, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("bfs: frontier plan equals the unrolled oracle on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = Bfs.qBfs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.sql(Bfs.qBfsSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // each node appears exactly once (first-reach distance)
    assert(got.size === got.map(_._1).size)
  }
}
