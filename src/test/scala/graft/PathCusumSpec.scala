package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Path trigrams (session-bounded triples) and integer CUSUM (drain,
  * accumulate, alarm) — hand cases plus corpus SQL-replay equality. */
class PathCusumSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.zipWithIndex.map { case ((u, t, ty), i) =>
      (u, i.toLong, Timestamp.valueOf(t), ty, 1.0, "{}")
    }.toDF("user_id", "event_id", "ts", "event_type", "value", "props")

  test("trigrams: triples never cross a session boundary") {
    // user 1: a,b,c within one session then a NEW session d,e,f
    // (2h gap) — only (a,b,c) and (d,e,f) count, nothing bridging
    val e = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:10:00", "c"),
      (1L, "2024-01-01 12:30:00", "d"),
      (1L, "2024-01-01 12:35:00", "e"),
      (1L, "2024-01-01 12:40:00", "f"))
    val got = Events.pathTrigrams(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(("a", "b", "c"), ("d", "e", "f")))
  }

  test("cusum: sustained excess accumulates, drains at zero, alarms") {
    // one type, 10 dense hours: 8 quiet hours of 1, then 2 hours of 20
    // — mean ≈ 4.8; the burst accumulates positive drift
    val rows = (0 until 8).map(h =>
      (1L, s"2024-01-01 0$h:30:00", "x")) ++ Seq(
      (1L, "2024-01-01 08:30:00", "x"), (1L, "2024-01-01 09:30:00", "x"))
    val burst = (0 until 19).flatMap(i => Seq(
      (1L, "2024-01-01 08:31:00", "x"), (1L, "2024-01-01 09:31:00", "x")))
    val e = ev((rows ++ burst): _*)
    val out = Events.cusum(e).orderBy("hour").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    // quiet prefix: drift negative, cusum pinned at 0 by the running min
    assert(out.take(8).forall(_._2 == 0L))
    // burst hours: strictly positive accumulation, second > first
    assert(out(8)._2 > 0L && out(9)._2 > out(8)._2)
  }

  test("unpivot: inversion law — unpivot(pivot(events)) == plain groupBy") {
    val dir = "/root/testdata/sf0.001"
    val got = Events.qUnpivot(spark, dir)
    val want = Tables(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("seasonal naive: a 24-periodic signal scores ZERO seasonal error") {
    // 72 dense hours of a clean 24-periodic pattern (h%24 + 1 events in
    // hour h): lag-24 predicts perfectly once a full day is behind it,
    // the naive lag-1 cannot — MASE 0
    val rows = for {
      h <- 0 until 72
      _ <- 0 until (h % 24) + 1
    } yield (1L, f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:15:00", "x")
    val out = Events.seasonalNaive(ev(rows: _*)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 0L)       // seasonal_abs_err
    assert(r.getLong(3) > 0L)         // naive_abs_err
    assert(r.getDouble(4) === 0.0)    // mase
    assert(r.getLong(1) === 72L - 24L) // hours scored
  }

  test("both: corpus plans equal their SQL replays") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val tri = Events.qPathTrigrams(spark, dir)
    val triSql = spark.sql(
      Events.qPathTrigramsSql.replace("epoch_us", "unix_micros"))
    assert(tri.exceptAll(triSql).isEmpty && triSql.exceptAll(tri).isEmpty)
    assert(tri.count() > 0)

    val cu = Events.qCusum(spark, dir)
    val cuSql = spark.sql(Events.qCusumSql
      .replace("unnest(generate_series(h0, h1, INTERVAL 1 HOUR))",
        "explode(sequence(h0, h1, INTERVAL 1 HOUR))"))
    assert(cu.exceptAll(cuSql).isEmpty && cuSql.exceptAll(cu).isEmpty)
    assert(cu.count() > 0)
  }
}
