package graft

import graft.operators.Scd2
import java.sql.Date

/** SCD2: hand-built histories (runs collapse, same-grain dedup, open
  * current row, version ordinals) and the window plan vs its SQL
  * replay on the corpus. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("scd2: runs collapse, intervals abut, last row open") {
    val obs = Seq(
      (1L, d("2024-01-01"), "gold"),
      (1L, d("2024-02-01"), "gold"),   // repeat — collapses
      (1L, d("2024-03-01"), "silver"), // change
      (1L, d("2024-05-01"), "gold"),   // change back — NEW version
      (2L, d("2024-01-15"), "bronze"))
      .toDF("key", "at", "value")
    val got = Scd2.scd2(obs).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString).orNull,
        r.getInt(4))).toSet
    assert(got === Set(
      (1L, "gold", "2024-01-01", "2024-03-01", 1),
      (1L, "silver", "2024-03-01", "2024-05-01", 2),
      (1L, "gold", "2024-05-01", null, 3),
      (2L, "bronze", "2024-01-15", null, 1)))
  }

  test("scd2: two observations on the same grain keep the MIN value") {
    val obs = Seq(
      (1L, d("2024-01-01"), "b"),
      (1L, d("2024-01-01"), "a"))
      .toDF("key", "at", "value")
    val got = Scd2.scd2(obs).collect()
    assert(got.length === 1 && got.head.getString(1) === "a")
  }

  test("scd2: plan equals SQL replay on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = Scd2.qScd2(spark, dir)
    val want = spark.sql(Scd2.qScd2Sql)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    // every customer's version-1 row starts its history and exactly one
    // open row per customer
    val open = got.filter("valid_to IS NULL").groupBy("c_custkey").count()
    assert(open.filter("count <> 1").isEmpty)
  }
}
