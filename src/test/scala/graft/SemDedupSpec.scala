package graft

import org.apache.spark.sql.DataFrame
import graft.ext.SemDedup

/** SemDeDup semantics on planted duplicate groups (hand-assigned cells —
  * the production path minus the seeded k-means), plus the
  * no-surviving-pair invariant on the real corpus through the full
  * quantizer path. */
class SemDedupSpec extends SparkSpec {

  private def unit(v: Array[Double]): Seq[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat).toSeq
  }

  // cell 0: duplicate group A (3 members, pairwise cos > 0.999) + one
  // unrelated single; cell 1: duplicate group B (2 members) + a single
  private def planted: DataFrame = {
    import spark.implicits._
    Seq(
      (10L, unit(Array(1, 0.01, 0, 0)), 0),
      (11L, unit(Array(1, 0, 0.02, 0)), 0),
      (12L, unit(Array(1, 0.04, 0, 0)), 0), // farthest from centroid c0
      (13L, unit(Array(0, 1, 0, 0)), 0),    // single
      (20L, unit(Array(0, 0, 1, 0.01)), 1),
      (21L, unit(Array(0, 0, 1, 0.03)), 1), // farthest from centroid c1
      (22L, unit(Array(0, 0, 0, 1)), 1)     // single
    ).toDF("vec_id", "embedding", "cell")
  }
  private val centroids: Array[Array[Double]] =
    Array(Array(1, 0, 0, 0), Array(0, 0, 1, 0))

  test("semdedup keeps one survivor per planted group — the farthest " +
    "from the centroid — and every singleton") {
    val got = SemDedup.semDedupFrom(planted, centroids, minCos = 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("keep")).toMap
    assert(got === Map(
      10L -> 0, 11L -> 0, 12L -> 1, 13L -> 1,
      20L -> 0, 21L -> 1, 22L -> 1))
  }

  test("semdedup cent_cos is the true cosine to the own-cell centroid") {
    val r = SemDedup.semDedupFrom(planted, centroids)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cent_cos")).toMap
    assert(math.abs(r(13L)) < 1e-6)           // orthogonal single
    assert(r(10L) > r(12L))                   // smaller perturbation → closer
    assert(math.abs(r(22L)) < 1e-6)
  }

  test("cells over the mining cap are excluded from mining, members kept") {
    val got = SemDedup.semDedupFrom(planted, centroids, maxCell = 3)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("keep")).toMap
    // cell 0 has 4 members > cap → no mining there, all kept;
    // cell 1 (3 members ≤ cap) still resolves its group
    assert(got(10L) === 1 && got(11L) === 1 && got(12L) === 1)
    assert(got(20L) === 0 && got(21L) === 1)
  }

  test("real corpus through the quantizer: verdict covers every vector " +
    "and no two kept vectors in one cell are semantic duplicates") {
    val dir = "/root/testdata/sf0.001"
    val verdict = SemDedup.qSemDedup(spark, dir).collect()
    assert(verdict.length === 500)
    // brute-force the invariant driver-side (500 × 64 floats)
    val emb = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val keptByCell = verdict.filter(_.getAs[Int]("keep") == 1)
      .groupBy(_.getAs[Int]("cell"))
    keptByCell.values.foreach { vs =>
      val ids = vs.map(_.getAs[Long]("vec_id"))
      for (i <- ids.indices; j <- i + 1 until ids.length) {
        val (a, b) = (emb(ids(i)), emb(ids(j)))
        val cos = a.zip(b).map { case (x, y) => x * y }.sum
        assert(cos < SemDedup.semDedupMinCos,
          s"kept pair ${ids(i)},${ids(j)} cos=$cos")
      }
    }
  }

  test("deterministic sign-bit variant reproduces a full driver-side " +
    "replay: cells, pairs, closure, survivor") {
    val dir = "/root/testdata/sf0.001"
    val got = SemDedup.qSemDedupDet(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Int]("keep")))).toMap
    // driver-side reference over the raw floats
    val emb = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    val bits = SemDedup.semDedupDetBits
    def cellOf(v: Array[Float]): Int =
      (0 until bits).map(j => if (v(j) >= 0) 1 << j else 0).sum
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val cells = emb.map { case (id, v) => id -> cellOf(v) }
    assert(got.map { case (id, (c, _)) => id -> c } === cells)
    // mined pairs under the det threshold
    val byCell = emb.keys.groupBy(cells)
    val pairs = byCell.values.flatMap { ids =>
      val s = ids.toSeq.sorted
      for {
        i <- s.indices; j <- i + 1 until s.length
        if dot(emb(s(i)), emb(s(j))) >= SemDedup.semDedupDetMinCos
      } yield (s(i), s(j))
    }.toSeq
    assert(pairs.nonEmpty, "det threshold must exercise the pipeline")
    // union-find closure + farthest-from-centroid survivor
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val centCos = emb.map { case (id, v) =>
      val c = cells(id)
      val cos = (0 until bits).map { j =>
        val s = if (((c >> j) & 1) == 1) 1.0 else -1.0
        v(j).toDouble * ((s / math.sqrt(bits.toDouble)).toFloat.toDouble)
      }.sum
      id -> cos
    }
    val survivors = clustered.groupBy(find)
      .values.map(_.minBy(id => (centCos(id), id))).toSet
    emb.keys.foreach { id =>
      val expect = if (!clustered.contains(id) || survivors(id)) 1 else 0
      assert(got(id)._2 === expect, s"vec $id keep")
    }
  }
}
