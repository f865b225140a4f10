package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Rolling KMV sketch: exactness below k, error bound vs the exact
  * rolling operator on the corpus, and the WindowGroupLimit plan shape
  * that keeps per-day sketches below the exchange. */
class RollingHllSpec extends SparkSpec {
  import spark.implicits._

  test("rolling sketch: windows with < k distinct users are EXACT") {
    // 3 users across 2 adjacent days — every 7-day window ≪ k=64
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (2L, "2024-01-02 09:00:00"), (3L, "2024-01-02 12:00:00"))
      .map { case (u, t) => (u, Timestamp.valueOf(t)) }
      .toDF("user_id", "ts")
    val sk = Events.rollingHll(ev).collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(3)).toMap
    val exact = Events.rollingActive(ev).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(sk.keySet === exact.keySet)
    sk.foreach { case (d, est) => assert(est === exact(d).toDouble) }
  }

  test("rolling sketch: corpus estimates within the 1/sqrt(k) regime of exact") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    val sk = Events.rollingHll(ev).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(3)))
    val exact = Events.rollingActive(ev).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(sk.nonEmpty && sk.map(_._1).toSet === exact.keySet)
    sk.foreach { case (day, kUsed, est) =>
      val ex = exact(day).toDouble
      if (kUsed < Events.rollingKmvK) assert(est === ex)
      // 4σ at σ ≈ 1/√64 = 12.5%
      else assert(math.abs(est - ex) / ex < 0.5,
        s"$day: est $est vs exact $ex")
    }
  }

  test("rolling sketch: per-day bottom-k plans as WindowGroupLimit") {
    val dir = "/root/testdata/sf0.001"
    val plan = Events.qRollingHll(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }
}
