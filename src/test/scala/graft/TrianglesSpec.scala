package graft

import graft.operators.Triangles

/** Triangle counting: hand-computed stats on a 2-basket graph and the
  * Spark-SQL replay of the oracle text on the corpus. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("triangles: hand-computed two-basket graph") {
    // basket {1,2,3} and basket {2,3,4}: edges 12 13 23 24 34;
    // degrees 1:2 2:3 3:3 4:2; triangles (1,2,3) and (2,3,4);
    // wedges Σ d(d−1)/2 = 1+3+3+1 = 8; clustering = 3000·2 div 8 = 750
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 2L), (20L, 3L), (20L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val r = Triangles.triangleStats(li).head
    assert(r.getLong(r.fieldIndex("n_nodes")) === 4L)
    assert(r.getLong(r.fieldIndex("n_edges")) === 5L)
    assert(r.getLong(r.fieldIndex("n_wedges")) === 8L)
    assert(r.getLong(r.fieldIndex("n_triangles")) === 2L)
    assert(r.getLong(r.fieldIndex("clustering_permille")) === 750L)
  }

  test("triangles: hub-star graph has zero triangles") {
    // star: hub 1 with leaves 2..5, no closing edges
    val li = (2L to 5L).flatMap(leaf => Seq((leaf * 100, 1L), (leaf * 100, leaf)))
      .toDF("l_orderkey", "l_partkey")
    val r = Triangles.triangleStats(li).head
    assert(r.getLong(r.fieldIndex("n_triangles")) === 0L)
    assert(r.getLong(r.fieldIndex("n_edges")) === 4L)
  }

  test("triangles: engine equals its own oracle text on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = Triangles.qTriangles(spark, dir).head.toSeq
    val want = spark.sql(
      Triangles.qTrianglesSql.replace(" // ", " div ")).head.toSeq
    assert(got === want)
    assert(got.head.asInstanceOf[Long] > 0)
  }
}
