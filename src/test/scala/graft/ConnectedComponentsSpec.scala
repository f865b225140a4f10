package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.ConnectedComponents

/** Star-contraction connected components vs a driver-side union-find
  * ground truth, over random graphs and the adversarial shapes the
  * O(log² n) guarantee exists for. */
class ConnectedComponentsSpec extends SparkSpec {

  /** Ground truth: path-compressed union-find over the same edges. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    ConnectedComponents.components(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs match union-find (components = min label)") {
    val genGraph = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges
    forAllSamples(genGraph, n = 12) { edges =>
      val nonSelf = edges.filter { case (a, b) => a != b }
      if (nonSelf.nonEmpty) {
        assert(run(nonSelf) === unionFind(nonSelf))
      }
    }
  }

  test("chain of 256 (diameter worst case) converges to one component") {
    val chain = (0L until 255L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size === 256)
    assert(got.values.toSet === Set(0L))
  }

  test("descending chain + duplicate/self edges canonicalize") {
    // edges given large-to-small, with dupes and self loops mixed in
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 3L), (4L, 5L), (3L, 2L),
      (10L, 11L), (11L, 10L))
    val got = run(edges)
    assert(got === Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L,
      10L -> 10L, 11L -> 10L))
  }

  test("mega-hub: a 30k-leaf star through a non-min hub converges " +
       "without per-node neighbor lists") {
    import spark.implicits._
    // hub 1 carries 30k larger leaves AND an edge to smaller node 0,
    // so every leaf must be re-pointed from the hub to 0 — the shape
    // where a collect_list formulation holds one node's whole
    // neighborhood on one executor; the join-based min never does.
    val leaves = (2L to 30001L).map(i => (1L, i))
    val df = (leaves :+ ((1L, 0L))).toDF("src", "dst")
    val got = ConnectedComponents.components(df, "src", "dst")
    assert(got.count() === 30002)
    assert(got.select("component").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("two stars sharing no nodes stay separate") {
    val a = (1L to 6L).map(i => (0L, i))
    val b = (101L to 104L).map(i => (100L, i))
    val got = run(a ++ b)
    assert(got.filter(_._1 <= 6L).values.toSet === Set(0L))
    assert(got.filter(_._1 >= 100L).values.toSet === Set(100L))
  }

  test("qDupClusters: every jaccard pair lands in one cluster, " +
       "canonical flag marks the minimum") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.ext.Dedup.qDedupJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = graft.ext.Dedup.qDupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(clusters.nonEmpty)
    // exactly the clustered-node set, no extras
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.keySet === nodes)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 === clusters(b)._1)
    }
    clusters.foreach { case (doc, (cid, canon)) =>
      assert(cid <= doc)
      assert(canon === (cid == doc))
    }
    // cluster id is a member of its own cluster
    val ids = clusters.values.map(_._1).toSet
    assert(ids.subsetOf(clusters.keySet))
  }
}
