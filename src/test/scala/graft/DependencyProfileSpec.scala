package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.DependencyProfile

/** FD (g₃) and inclusion-dependency profiling. */
class DependencyProfileSpec extends SparkSpec {

  private def df(rows: Seq[(java.lang.Long, String, String)]) = {
    val schema = StructType(Seq(
      StructField("a", LongType, true),
      StructField("b", StringType, true),
      StructField("c", StringType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2), schema)
  }

  test("g3: exact FD scores 0 violations; a known violation counts minimal deletions") {
    // a -> b holds; b -> c violated exactly once (b=x maps to u,u,v)
    val d = df(Seq(
      (1L, "x", "u"), (2L, "x", "u"), (3L, "x", "v"),
      (4L, "y", "w"), (5L, "y", "w")))
    val out = DependencyProfile.fdProfile(d,
        Seq(("a->b", Seq("a"), "b"), ("b->c", Seq("b"), "c")))
      .collect().map(r => r.getString(0) -> r).toMap
    val ab = out("a->b")
    assert(ab.getAs[Long]("violations") === 0L)
    assert(ab.getAs[Boolean]("holds"))
    assert(ab.getAs[Long]("n_lhs") === 5L)
    val bc = out("b->c")
    assert(bc.getAs[Long]("violations") === 1L) // delete the one 'v' row
    assert(bc.getAs[Long]("g3_micro") === 200000L) // 1/5
    assert(!bc.getAs[Boolean]("holds"))
  }

  test("g3: composite LHS distinguishes (x,y)->z from x->z; nulls are marked") {
    val d = df(Seq(
      (1L, "p", "z1"), (1L, "q", "z2"), // (a,b) key; a alone violated
      (2L, null, "n1"), (2L, "", "n2"))) // null b vs empty b distinct
    val out = DependencyProfile.fdProfile(d,
        Seq(("ab->c", Seq("a", "b"), "c"), ("a->c", Seq("a"), "c")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("ab->c").getAs[Long]("violations") === 0L)
    assert(out("a->c").getAs[Long]("violations") === 2L)
  }

  test("inclusion profile on sf0.001: the four star FKs hold, the near-miss does not") {
    val out = DependencyProfile.qInclusionDeps(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size === 5)
    for (fk <- Seq("lineitem.l_orderkey", "orders.o_custkey",
        "customer.c_nationkey", "nation.n_regionkey")) {
      assert(out(fk).getAs[Boolean]("holds"), fk)
      assert(out(fk).getAs[Long]("containment_micro") === 1000000L)
    }
    val miss = out("customer.c_custkey")
    assert(!miss.getAs[Boolean]("holds"))
    assert(miss.getAs[Long]("n_contained") < miss.getAs[Long]("n_child"))
  }

  test("fd driver query: the orders primary key is an exact FD") {
    val out = DependencyProfile.qFdDiscover(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("holds")).toMap
    assert(out("orderkey->custkey"))
    assert(out.size === DependencyProfile.fdCandidates.size)
  }
}
