package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Funnel semantics on handcrafted data: greedy earliest-match, strict
  * time ordering between steps, out-of-order steps don't count, repeat
  * events are absorbed, users missing from the funnel types still get a
  * depth-0 row. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private def run(rows: Seq[(Long, Long, Timestamp, String)]) =
    Events.funnel(rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), (2 to 5).map(i =>
          Option(r.getTimestamp(i)).map(_.getTime / 60000L)))).toMap

  test("funnel: greedy earliest match, full and partial depths") {
    val out = run(Seq(
      // u1 completes the funnel, with decoys: the LATER signup is
      // ignored (greedy takes the earliest), the view BEFORE signup
      // doesn't count, the purchase before click doesn't count
      (1L, 1L, ts(5), "view"),     // too early: precedes any signup
      (1L, 2L, ts(10), "signup"),
      (1L, 3L, ts(40), "signup"),  // later signup: ignored
      (1L, 4L, ts(20), "view"),
      (1L, 5L, ts(25), "purchase"), // before click: not step 4
      (1L, 6L, ts(30), "click"),
      (1L, 7L, ts(50), "purchase"),
      // u2 stops at view; clicks never arrive
      (2L, 8L, ts(1), "signup"),
      (2L, 9L, ts(2), "view"),
      (2L, 10L, ts(3), "error"),   // non-funnel type: invisible
      // u3 has only out-of-order steps: purchase then signup
      (3L, 11L, ts(1), "purchase"),
      (3L, 12L, ts(2), "signup"),
      // u4 only non-funnel events: still present at depth 0
      (4L, 13L, ts(1), "error")))
    assert(out(1L) === ((4L, Seq(Some(10L), Some(20L), Some(30L), Some(50L)))))
    assert(out(2L) === ((2L, Seq(Some(1L), Some(2L), None, None))))
    assert(out(3L) === ((1L, Seq(Some(2L), None, None, None))))
    assert(out(4L) === ((0L, Seq(None, None, None, None))))
  }

  test("funnel: strictly-after semantics — same-timestamp step rejected") {
    val out = run(Seq(
      (1L, 1L, ts(10), "signup"),
      (1L, 2L, ts(10), "view"),   // ts == matched signup: NOT after it
      (1L, 3L, ts(11), "view")))
    assert(out(1L) === ((2L, Seq(Some(10L), Some(11L), None, None))))
  }

  test("funnel conversion rollup: counts and latencies replay the funnel") {
    val dir = "/root/testdata/sf0.001"
    val conv = Events.qFunnelConv(spark, dir).collect()(0)
    val f = Events.qFunnel(spark, dir)
    assert(conv.getLong(0) === f.count()) // n_users
    val lats = f.filter(col("depth") === 4)
      .select((unix_micros(col("t_purchase")) -
        unix_micros(col("t_signup"))).as("lat"))
      .collect().map(_.getLong(0))
    assert(conv.getLong(1) === lats.length.toLong) // n_converted
    assert(conv.getLong(4) === lats.min)           // min micros
    assert(conv.getLong(5) === lats.max)           // max micros
    assert(conv.getDouble(2) >= conv.getLong(4).toDouble &&
      conv.getDouble(2) <= conv.getDouble(3))      // min <= p50 <= p90
  }

  test("event transitions: lag pairs counted, totals = events - users") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val t = Events.qEventTransitions(spark, dir)
    val total = t.agg(sum("n")).as[Long].head()
    val ev = Tables(spark, dir, "events")
    // each user contributes (their events - 1) consecutive pairs
    assert(total === ev.count() - ev.select("user_id").distinct().count())
    // handcrafted: a->b->a yields (a,b) and (b,a)
    val tiny = Seq(
      (1L, 1L, ts(1), "a"), (1L, 2L, ts(2), "b"), (1L, 3L, ts(3), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = tiny.withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "event_type").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs === Set(("a", "b", 1L), ("b", "a", 1L)))
  }

  test("funnel: driver query equals the min-chain replayed in SQL") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = Events.qFunnel(spark, dir)
      .collect().map(r => r.toSeq).toSet
    // the min-chain formulation, computed independently via Spark SQL
    // (the DuckDB oracle runs the same text driver-side)
    val want = spark.sql(Events.qFunnelSql
        .replace("CAST(CASE", "CAST(CASE")) // same ANSI text runs on Spark
      .collect().map(r => r.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // non-vacuous: the fold genuinely matched (sf0.001 is a dense
    // month of events — every user completes the funnel, so the
    // interesting variance lives in the matched timestamps)
    val depths = got.map(_(1).asInstanceOf[Long])
    assert(depths.forall(_ === 4L))
    assert(got.map(_(2)).size > 1) // distinct per-user signup times
  }
}
