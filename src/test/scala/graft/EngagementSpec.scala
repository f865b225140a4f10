package graft

import java.sql.Timestamp
import graft.operators.{ChurnRisk, CoEngagement}

/** Churn-risk banding and the co-engagement matrix: hand frames —
  * exact band boundaries by cross-multiplication (a user exactly at
  * k× overdue lands in the upper band), single-event users in
  * 'unknown'; disjoint/identical/nested user sets pin Jaccard to
  * 0 / 1 / the containment ratio. */
class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def at(min: Int) = new Timestamp(
    Timestamp.valueOf("2024-03-01 00:00:00").getTime + min * 60000L)

  test("churn bands: exact boundaries, unknown for single-event") {
    // corpus max set by user 99 at minute 1000.
    // user 1: events at 0,100 (gap 100), last 100 → overdue 900 = 9x → ge8x
    // user 2: events at 800,900 → overdue 100 = 1x exactly → 1to2x
    //   (boundary: overdue·(n−1) = 1·span is NOT < span → next band)
    // user 3: events at 900,1000 → overdue 0 → lt1x
    // user 4: single event → unknown
    val ev = Seq(
      (1L, at(0)), (1L, at(100)),
      (2L, at(800)), (2L, at(900)),
      (3L, at(900)), (3L, at(1000)),
      (4L, at(500)),
      (99L, at(0)), (99L, at(1000)))
      .toDF("user_id", "ts")
    val out = ChurnRisk.churnRisk(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ge8x") === 1L)
    assert(out("1to2x") === 1L)
    assert(out("lt1x") === 2L) // user 3 + user 99 (overdue 0)
    assert(out("unknown") === 1L)
  }

  test("coengagement: disjoint → 0, identical → 1, nested → ratio") {
    val ev = (
      (1L to 10L).map(u => (u, "view")) ++      // 10 viewers
      (1L to 10L).map(u => (u, "click")) ++     // same 10 click
      (1L to 4L).map(u => (u, "purchase")) ++   // 4 of them purchase
      (21L to 30L).map(u => (u, "error")))      // disjoint error set
      .toDF("user_id", "event_type")
    val out = CoEngagement.coEngagement(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val cv = out(("click", "view"))
    assert(cv.getLong(cv.fieldIndex("jaccard_micro")) === 1000000L)
    assert(cv.getLong(cv.fieldIndex("p_y_given_x_micro")) === 1000000L)
    val ce = out(("click", "error"))
    assert(ce.getLong(ce.fieldIndex("jaccard_micro")) === 0L)
    val cp = out(("click", "purchase"))
    assert(cp.getLong(cp.fieldIndex("n_both")) === 4L)
    assert(cp.getLong(cp.fieldIndex("jaccard_micro")) === 400000L)
    assert(cp.getLong(cp.fieldIndex("p_y_given_x_micro")) === 400000L)
  }
}
