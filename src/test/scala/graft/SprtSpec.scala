package graft

import graft.operators.{AbTest, Sprt}

/** SPRT: the distributed prefix-sum walk must agree with a driver-side
  * sequential replay of Wald's test (sort the per-user rows, accumulate
  * the LLR, stop at the first boundary crossing). */
class SprtSpec extends SparkSpec {
  import spark.implicits._

  // user u arrives at ts = u (strictly increasing so arrival order is
  // unambiguous); purchases chosen so roughly half the users convert
  private def syntheticEvents(n: Long) = {
    val rows = (0L until n).flatMap { u =>
      val purchases = (u % 29).toInt // convMin = 14 -> ~half convert
      Seq.fill(math.max(purchases, 1))(
        (u, if (purchases > 0) "purchase" else "click",
          new java.sql.Timestamp(1700000000000L + u * 1000)))
    }
    rows.toDF("user_id", "event_type", "ts")
  }

  test("matches a sequential driver-side replay of Wald's walk") {
    val ev = syntheticEvents(400)
    // independent path: collect per-user rows, replay sequentially
    val pu = Sprt.perUser(ev)
      .select("arm", "first_ts", "user_id", "inc_micro")
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    val expected = pu.groupBy(_._1).map { case (arm, rows) =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._3))
      var llr = 0L; var n = 0L
      var hit: Option[(String, Long, Long)] = None
      ordered.foreach { r =>
        if (hit.isEmpty) {
          llr += r._4; n += 1
          if (llr >= Sprt.boundMicro) hit = Some(("accept_h1", n, llr))
          else if (llr <= -Sprt.boundMicro) hit = Some(("accept_h0", n, llr))
        }
      }
      arm -> hit.getOrElse(("continue", ordered.length.toLong,
        ordered.map(_._4).sum))
    }
    val got = Sprt.sprt(ev).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    assert(got.keySet === Set(0L, 1L))
  }

  test("balanced arms never decide; lopsided data decides early") {
    // every user converts -> each increment is +ln(p1/p0) > 0, so the
    // walk must cross A quickly: n_obs = ceil(bound / inc) per arm
    val ev = (0L until 200L).flatMap { u =>
      Seq.fill(AbTest.convMin)(
        (u, "purchase", new java.sql.Timestamp(1700000000000L + u)))
    }.toDF("user_id", "event_type", "ts")
    val out = Sprt.sprt(ev).collect()
    val incUp = math.round(1e6 * math.log(0.55 / 0.45))
    val needed = math.ceil(Sprt.boundMicro.toDouble / incUp).toLong
    out.foreach { r =>
      assert(r.getString(1) === "accept_h1")
      assert(r.getLong(2) === needed)
    }
  }
}
