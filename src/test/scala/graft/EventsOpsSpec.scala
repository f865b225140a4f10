package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Grouped top-k and hourly anomaly semantics on handcrafted data, plus
  * the WindowGroupLimit plan assertion for the top-k. */
class EventsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hour(h: Int, m: Int = 0) =
    new Timestamp(h * 3600000L + m * 60000L)

  test("top spenders: exact cent sums, rank within week, ties by user id") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.qTopSpenders(spark, dir).collect()
    assert(out.nonEmpty)
    val byWeek = out.groupBy(_.getTimestamp(0))
    byWeek.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length))
      // rank order follows (spend desc, user_id asc)
      val sorted = rows.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(2) > b.getDouble(2) ||
            (a.getDouble(2) == b.getDouble(2) &&
              a.getLong(1) < b.getLong(1)))
        case _ =>
      }
    }
  }

  test("top spenders: plan pushes the per-group limit (WindowGroupLimit)") {
    val plan = Events.qTopSpenders(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan")
  }

  test("event anomaly: 24h baseline permille, NULL until history complete") {
    // type "a": 25 consecutive hours, count 1 each except hour 24 has 3
    val rows = (0 until 24).flatMap(h => Seq((h, 1))) ++ Seq((24, 3))
    val ev = rows.zipWithIndex.flatMap { case ((h, n), i) =>
      (0 until n).map(j => (i * 10L + j, hour(h, j), 1L, "a", 0.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.createOrReplaceTempView("__anomaly_ev")

    val hourly = ev.groupBy(col("event_type"),
      date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    // replicate qEventAnomaly's window over the handcrafted frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(expr("unix_micros(hour) div 3600000000"))
      .rangeBetween(-24, -1)
    val out = hourly
      .withColumn("baseline_n", sum(col("n")).over(w))
      .withColumn("baseline_hours", count(col("n")).over(w))
      .withColumn("permille_of_baseline",
        when(col("baseline_hours") > 0,
          expr("n * 1000L * baseline_hours div baseline_n")))
      .collect()
      .map(r => r.getTimestamp(1).getTime / 3600000L ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // hour 0: empty trailing window -> NULL
    assert(out(0L) === None)
    // hours 1..23: every prior hour count 1, so baseline mean = 1 and
    // this hour's count 1 -> exactly 1000 permille
    (1 until 24).foreach(h => assert(out(h.toLong) === Some(1000L), s"hour $h"))
    // hour 24: 24 trailing ones, count 3 -> 3*1000*24/24 = 3000 permille
    assert(out(24L) === Some(3000L))
  }

  test("event anomaly: driver query matches its own SQL on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = Events.qEventAnomaly(spark, dir).collect()
      .map(_.toSeq).toSet
    // the oracle text, run through Spark SQL (DuckDB integer division
    // `//` is spelled `div` in Spark SQL)
    val sql = Events.qEventAnomalySql
      .replace("epoch_us(hour) // 3600000000", "unix_micros(hour) div 3600000000")
      .replace("""n * 1000 * (COUNT(n) OVER w)
              // (SUM(n) OVER w)""", """n * 1000 * (COUNT(n) OVER w)
              div (SUM(n) OVER w)""")
    val want = spark.sql(sql).collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.exists(r => r(3) != null)) // baselines actually form
  }
}
