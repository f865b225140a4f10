package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import graft.operators.{KaplanMeier, LogRank}

/** Log-rank: the distributed grid computation must equal a sequential
  * driver-side replay of the Mantel sums, and a planted arm-dependent
  * delay must be declared significant. */
class LogRankSpec extends SparkSpec {
  import spark.implicits._

  private def md5arm(u: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
  }

  private val day = 86400000000L

  // users convert on a day that depends on `delay`; non-converters
  // (u % 5 == 0) just click and are censored at their last event
  private def events(n: Long, delayArm1: Int) = {
    (0L until n).flatMap { u =>
      val arm = md5arm(u)
      val base = (u % 4 + 1).toInt
      val convDay = base + (if (arm == 1) delayArm1 else 0)
      val t0 = 1700000000000000L + u
      if (u % 5 == 0)
        Seq((u, "click", 1.0, t0), (u, "click", 1.0, t0 + 12 * day))
      else
        Seq((u, "click", 1.0, t0),
          (u, "purchase", 150.0, t0 + convDay * day))
    }.map { case (u, et, v, us) =>
      (u, et, v, new java.sql.Timestamp(us / 1000))
    }.toDF("user_id", "event_type", "value", "ts")
  }

  test("matches a sequential replay of the Mantel O/E/V sums") {
    val ev = events(200, 2)
    val pu = LogRank.perUser(ev)
      .select("arm", "event", "t_days").as[(Long, Long, Long)].collect()
    // sequential life-table walk over the pooled grid
    val grid = pu.groupBy(_._3).toSeq.sortBy(_._1).map { case (t, rows) =>
      (t, rows.map(_._2).sum, // d
        rows.filter(_._1 == 1).map(_._2).sum, // d1
        rows.length.toLong, rows.count(_._1 == 1).toLong) // r, r1
    }
    var n = pu.length.toLong; var n1 = pu.count(_._1 == 1).toLong
    var o1 = 0L; var e = 0L; var v = 0L
    grid.foreach { case (_, d, d1, r, r1) =>
      if (d > 0 && n >= 1)
        e += math.round(1e6 * d * n1 / n.toDouble)
      if (d > 0 && n > 1)
        v += math.round(1e6 * ((d * (n1 / n.toDouble))
          * (1.0 - n1 / n.toDouble)) * ((n - d) / (n - 1).toDouble))
      o1 += d1; n -= r; n1 -= r1
    }
    val z = math.round(1e6 * (o1 - e / 1e6) / math.sqrt(v / 1e6))
    val out = LogRank.logRank(ev).collect().head
    assert(out.getLong(out.fieldIndex("o1")) === o1)
    assert(out.getLong(out.fieldIndex("e1_micro")) === e)
    assert(out.getLong(out.fieldIndex("v_micro")) === v)
    assert(math.abs(out.getLong(out.fieldIndex("z_micro")) - z) <= 1)
  }

  test("planted delay in arm 1 is significant; no delay is not") {
    val delayed = LogRank.logRank(events(300, 4)).collect().head
    assert(delayed.getBoolean(delayed.fieldIndex("significant")))
    // arm 1 converts LATER -> fewer early treated events than expected
    assert(delayed.getLong(delayed.fieldIndex("z_micro")) < 0)
    val nul = LogRank.logRank(events(300, 0)).collect().head
    assert(!nul.getBoolean(nul.fieldIndex("significant")))
  }

  test("clocks agree with KaplanMeier's life table") {
    val ev = events(100, 1)
    val km = KaplanMeier.lifeTable(KaplanMeier.timeToBigPurchase(ev))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val lr = LogRank.perUser(ev).groupBy("t_days")
      .agg(org.apache.spark.sql.functions.sum("event").as("d"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) - r.getLong(1)))
    assert(km.toSeq === lr.toSeq)
  }
}
