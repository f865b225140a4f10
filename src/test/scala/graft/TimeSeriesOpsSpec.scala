package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Semantics of the round-10 time-series trio on handcrafted data —
  * gap-fill spine (dense hours, zero-fill, LOCF), gaps-and-islands
  * (run collapse, tie order), last-touch attribution (window edges) —
  * plus the islands single-exchange plan assertion.
  */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    new Timestamp(h * 3600000L + m * 60000L)

  private def ev(rows: (Long, Timestamp, Long, String, Double)*) =
    rows.map { case (id, t, u, ty, v) => (id, t, u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gap fill: dense spine, zero-filled gaps, forward-filled sums") {
    // type "a": activity at hours 0 (sum 1.50) and 3 (sum 2.25) — hours
    // 1 and 2 are gaps; type "b": single hour, no gaps
    val df = ev(
      (1L, ts(0), 1L, "a", 1.00), (2L, ts(0, 30), 1L, "a", 0.50),
      (3L, ts(3), 2L, "a", 2.25),
      (4L, ts(5), 1L, "b", 9.99))
    val out = Events.gapFill(df).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4))).toMap
    assert(out.keySet === Set("a" -> 0L, "a" -> 1L, "a" -> 2L, "a" -> 3L,
      "b" -> 5L))
    assert(out("a" -> 0L) === ((2L, 0, 1.50))) // observed
    assert(out("a" -> 1L) === ((0L, 1, 1.50))) // gap: zero count, LOCF sum
    assert(out("a" -> 2L) === ((0L, 1, 1.50)))
    assert(out("a" -> 3L) === ((1L, 0, 2.25))) // new observation resets
    assert(out("b" -> 5L) === ((1L, 0, 9.99)))
  }

  test("islands: consecutive same-type runs collapse, ties by event_id") {
    // user 1: a a b a  (ts order; the two leading a's are ONE island,
    // the trailing a a NEW island); same-ts pair ordered by event_id
    val df = ev(
      (1L, ts(0), 1L, "a", 0.0), (2L, ts(0), 1L, "a", 0.0),
      (3L, ts(1), 1L, "b", 0.0), (4L, ts(2), 1L, "a", 0.0),
      (5L, ts(0), 2L, "b", 0.0))
    val out = Events.islands(df).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime / 3600000L,
        r.getTimestamp(3).getTime / 3600000L, r.getLong(4))).toSet
    assert(out === Set(
      (1L, "a", 0L, 0L, 2L), (1L, "b", 1L, 1L, 1L), (1L, "a", 2L, 2L, 1L),
      (2L, "b", 0L, 0L, 1L)))
  }

  test("islands: one exchange serves both windows and the rollup") {
    val plan = Events.qIslands(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange in plan:\n$plan")
  }

  test("attribution: last click within window wins; outside/absent -> null") {
    val df = ev(
      // user 1: click at 0:00, purchase at 0:20 (within 30m) -> attributed
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(0, 20), 1L, "purchase", 5.0),
      // user 1 second purchase at 0:55: last click 0:00 is 55m back -> null
      (3L, ts(0, 55), 1L, "purchase", 7.0),
      // user 2: two clicks, LAST one (0:10) is the attributed touch
      (4L, ts(0), 2L, "click", 0.0), (5L, ts(0, 10), 2L, "click", 0.0),
      (6L, ts(0, 25), 2L, "purchase", 3.0),
      // user 3: purchase with no click at all
      (7L, ts(1), 3L, "purchase", 1.0))
    val out = Events.attribution(df).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(4)).map(_.getTime / 60000L), r.getInt(5)))
      .toMap
    assert(out(2L) === ((Some(0L), 1)))
    assert(out(3L) === ((None, 0)))
    assert(out(6L) === ((Some(10L), 1)))
    assert(out(7L) === ((None, 0)))
    assert(out.size === 4) // purchases only
  }

  test("attribution: click filter is pushed to the scan") {
    val plan = Events.qAttribution(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(event_type"), s"expected pushed isin:\n$plan")
  }
}
