package graft

import graft.operators.KmvSetOps

/** KMV set algebra: identical sets estimate J=1, disjoint sets J=0,
  * sub-k sets give EXACT union sizes, and the driver query's estimates
  * sit inside the sketch's error envelope against its own exact-audit
  * column. */
class KmvSetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("identical sets: est_jaccard = exact = 1; disjoint: both 0") {
    val du = ((1 to 300).map(i => ("a", i.toLong)) ++
      (1 to 300).map(i => ("b", i.toLong)) ++
      (1000 to 1300).map(i => ("c", i.toLong))).toDF("t", "u")
    val out = KmvSetOps.kmvOverlap(du).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(6))).toMap
    val (estAb, exAb) = out(("a", "b"))
    assert(estAb === 1.0 && exAb === 1.0)
    val (estAc, exAc) = out(("a", "c"))
    assert(estAc === 0.0 && exAc === 0.0)
  }

  test("sub-k sets: est_union is the exact union size") {
    // 40 + 40 with 20 shared = union 60 < k=128 → estimator goes exact
    val du = ((1 to 40).map(i => ("a", i.toLong)) ++
      (21 to 60).map(i => ("b", i.toLong))).toDF("t", "u")
    val r = KmvSetOps.kmvOverlap(du).collect().head
    assert(r.getDouble(4) === 60.0) // est_union
    assert(r.getDouble(3) === 20.0 / 60.0) // sub-k sketch IS the set
    assert(r.getDouble(6) === 20.0 / 60.0) // exact agrees
  }

  test("driver query: estimates within the 1/sqrt(k) envelope of exact") {
    val rows = KmvSetOps.qKmvIntersect(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val tol = 4.0 / math.sqrt(KmvSetOps.kmvK.toDouble) // ~4σ
    rows.foreach { r =>
      val est = r.getDouble(3)
      val exact = r.getDouble(6)
      assert(math.abs(est - exact) <= tol,
        s"${r.getString(0)}~${r.getString(1)}: est $est vs exact $exact")
    }
  }
}
