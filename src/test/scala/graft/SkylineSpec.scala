package graft

import graft.operators.Skyline

/** Skyline: hand-computed frontiers (duplicates, ties on one axis,
  * staircase) and the bucketed plan vs the all-pairs oracle text. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: staircase, dominated interior, duplicate points survive together") {
    // frontier: (10,1), (5,5), (1,10); dominated: (4,4) by (5,5),
    // (5,1) by (5,5) (tie on x, strict on y); duplicates (5,5)×2 both
    // survive (equal points don't dominate each other)
    val pts = Seq(
      (1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L),
      (4L, 4L, 4L), (5L, 5L, 1L), (6L, 5L, 5L))
      .toDF("id", "x", "y")
    val got = Skyline.skyline(pts).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 6L))
  }

  test("skyline: single point and empty input") {
    val one = Seq((1L, 3L, 3L)).toDF("id", "x", "y")
    assert(Skyline.skyline(one).count() === 1)
    assert(Skyline.skyline(one.limit(0)).count() === 0)
  }

  test("skyline: bucketed plan equals the all-pairs oracle on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = Skyline.qSkyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sql = Skyline.qSkylineSql.replace(
      "date_diff('day', DATE '1970-01-01',\n      |      CAST(MAX(o_orderdate) AS DATE))".stripMargin,
      "datediff(CAST(MAX(o_orderdate) AS DATE), DATE '1970-01-01')")
    val want = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // frontier is a strict staircase: sorted by x asc, y strictly desc
    val stair = got.toSeq.sortBy(_._2)
    stair.map(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b || stair.size == 1)
      case _ =>
    }
  }
}
