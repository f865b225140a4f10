package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Concurrency

/** Peak concurrency: hand-computed interval sets (midnight spanning,
  * touching endpoints, same-instant sessions) and agreement with the
  * single-window SQL formulation on the corpus. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("concurrency: hand-computed overlaps, inclusive ends, midnight span") {
    // day 1: [01:00,02:00], [01:30,03:00], [02:00,02:30] → at 02:00 the
    // first session's end coincides with the third's start: ends sort
    // after starts, so all three are briefly concurrent → peak 3.
    // [23:00, day2 01:00] spans midnight; day 2 has one boundary row
    // (the end) where only that session is open → peak 1.
    val sessions = Seq(
      (ts("2026-01-01 01:00:00"), ts("2026-01-01 02:00:00")),
      (ts("2026-01-01 01:30:00"), ts("2026-01-01 03:00:00")),
      (ts("2026-01-01 02:00:00"), ts("2026-01-01 02:30:00")),
      (ts("2026-01-01 23:00:00"), ts("2026-01-02 01:00:00")))
      .toDF("session_start", "session_end")
    val got = Concurrency.peakConcurrency(sessions).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(got("2026-01-01 00:00:00.0") === 3L)
    assert(got("2026-01-02 00:00:00.0") === 1L)
  }

  test("concurrency: single-event sessions (start == end) count") {
    val sessions = Seq(
      (ts("2026-01-01 10:00:00"), ts("2026-01-01 10:00:00")),
      (ts("2026-01-01 10:00:00"), ts("2026-01-01 10:00:00")))
      .toDF("session_start", "session_end")
    val got = Concurrency.peakConcurrency(sessions).head.getLong(1)
    assert(got === 2L)
  }

  test("concurrency: PrefixSum path equals the window formulation on the corpus") {
    val dir = "/root/testdata/sf0.001"
    val sessions = graft.operators.Events.qSessionize(spark, dir)
    val got = Concurrency.peakConcurrency(sessions).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    // the semantic the oracle runs: one global window (fine at spec SF)
    sessions.createOrReplaceTempView("s_conc")
    val want = spark.sql(
      """WITH b AS (
        |  SELECT session_start AS ts, 1L AS delta FROM s_conc
        |  UNION ALL SELECT session_end AS ts, -1L AS delta FROM s_conc),
        |r AS (
        |  SELECT ts, SUM(delta) OVER (
        |    ORDER BY ts ASC, delta DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    + CASE WHEN delta = -1 THEN 1 ELSE 0 END AS c
        |  FROM b)
        |SELECT date_trunc('day', ts) AS day, MAX(c) AS peak
        |FROM r GROUP BY 1""".stripMargin).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
