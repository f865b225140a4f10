package graft

import graft.operators.CdcApply

/** CDC apply: tombstone-after-upsert, upsert-after-tombstone
  * (resurrection), untouched base passthrough, insert-only keys, and
  * the max_by plan vs the window-form oracle on the corpus. */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    .toDF("key", "value")

  private def chg(rows: (Long, Long, Long, String, Long)*) =
    rows.toDF("key", "seq", "tie", "op", "value")

  test("cdc: latest op wins — tombstone kills, later upsert resurrects") {
    val changes = chg(
      (1L, 1L, 0L, "U", 11L), (1L, 2L, 0L, "D", 0L),   // 1 deleted
      (2L, 1L, 0L, "D", 0L), (2L, 2L, 0L, "U", 22L),   // 2 resurrected
      (4L, 1L, 0L, "U", 44L))                          // 4 inserted
    val got = CdcApply.applyCdc(base, changes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(
      (2L, 22L, "cdc"), (3L, 30L, "base"), (4L, 44L, "cdc")))
  }

  test("cdc: sequence ties break on the tie column deterministically") {
    val changes = chg((1L, 5L, 1L, "U", 100L), (1L, 5L, 2L, "U", 200L))
    val got = CdcApply.applyCdc(base, changes)
      .filter("key = 1").collect()
    assert(got.head.getLong(1) === 200L)
  }

  test("cdc: plan equals the window-form oracle on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = CdcApply.qCdcApply(spark, dir)
    val want = spark.sql(CdcApply.qCdcApplySql)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }
}
