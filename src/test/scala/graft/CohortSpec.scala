package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Cohort retention and rolling-active semantics on handcrafted data. */
class CohortSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 is a Monday — week boundaries land exactly on it
  private def day(d: Int, h: Int = 12) =
    Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")

  test("cohort retention: first-seen week buckets, offsets count distinct actives") {
    val ev = Seq(
      // u1: first seen week of Jan 1; active weeks 0, 1, 3
      (1L, day(1), "view"), (1L, day(2), "click"), // week 0 twice: 1 pair
      (1L, day(10), "view"),                       // week 1 (Jan 8-14)
      (1L, day(23), "view"),                       // week 3 (Jan 22-28)
      // u2: same cohort, active weeks 0 and 1
      (2L, day(3), "view"), (2L, day(8), "view"),
      // u3: cohort week 1, active week 1 only
      (3L, day(9), "view")
    ).toDF("user_id", "ts", "event_type")

    val got = Events.cohortRetention(ev)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) ->
        r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L, // u1, u2 active in their cohort week
      ("2024-01-01", 1L) -> 2L, // u1, u2 both return in week 1
      ("2024-01-01", 3L) -> 1L, // only u1 returns in week 3
      ("2024-01-08", 0L) -> 1L  // u3's own cohort
    ))
  }

  test("rolling 7-day actives: each (user, day) pair feeds the next 7 report days") {
    val ev = Seq(
      (1L, day(1)), (1L, day(1, 18)), // same user+day: deduped
      (2L, day(5)),
      (3L, day(12))
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))

    val got = Events.rollingActive(ev)
      .collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    // report days are activity days only: 1, 5, 12
    assert(got === Map(
      "2024-01-01" -> 1L, // u1
      "2024-01-05" -> 2L, // u1 (active day 1, within 7) + u2
      "2024-01-12" -> 1L  // u3 alone: day-5 activity is 7 days back (out)
    ))
  }

  test("rolling window boundary: day d counts for d+6 but not d+7") {
    val ev = Seq(
      (1L, day(1)),
      (2L, day(7)),  // report day: u1's day-1 still in [1..7]
      (2L, day(8))   // report day: u1's day-1 now out of [2..8]
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Events.rollingActive(ev)
      .collect().map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    assert(got === Map(
      "2024-01-01" -> 1L,
      "2024-01-07" -> 2L,
      "2024-01-08" -> 1L))
  }
}
