package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import graft.operators.DiffInDiff

/** DiD: matches a driver-side recomputation; a common time trend
  * cancels exactly; a planted treated-only post shift is recovered. */
class DiffInDiffSpec extends SparkSpec {
  import spark.implicits._

  private def md5arm(u: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
  }

  private val pre = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
  private val post = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")

  // every user: baseline b_u pre; pre + trend post; treated users get
  // `lift` extra cents post only
  private def events(n: Long, trend: Long, lift: Long) =
    (0L until n).flatMap { u =>
      val b = (u % 10 + 1) * 100
      val liftU = if (md5arm(u) == 1) lift else 0L
      Seq((u, "purchase", b / 100.0, pre),
        (u, "purchase", (b + trend + liftU) / 100.0, post))
    }.toDF("user_id", "event_type", "value", "ts")

  test("matches a driver recomputation; common trend cancels to zero") {
    val ev = events(240, trend = 777, lift = 0)
    val out = DiffInDiff.didTest(ev).collect().head
    // d_u = trend for EVERY user -> DiD exactly 0, zero variance in
    // both arms -> the exact-integer guard abstains on t
    assert(out.getLong(out.fieldIndex("did_micro")) === 0L)
    assert(out.getLong(out.fieldIndex("t_micro")) === 0L)
    assert(!out.getBoolean(out.fieldIndex("significant")))
    // cell means move by exactly the trend
    assert(out.getLong(out.fieldIndex("post_c_micro"))
      - out.getLong(out.fieldIndex("pre_c_micro")) === 777000000L)
  }

  test("planted treated-only post lift is recovered exactly") {
    val ev = events(240, trend = 500, lift = 300)
    val out = DiffInDiff.didTest(ev).collect().head
    assert(out.getLong(out.fieldIndex("did_micro")) === 300000000L)
    // d is CONSTANT within each arm -> both variance numerators are
    // exactly 0 and the integer guard abstains rather than emitting
    // the infinite t a naive division would
    assert(out.getLong(out.fieldIndex("t_micro")) === 0L)
    assert(!out.getBoolean(out.fieldIndex("significant")))
  }

  test("noisy lift: t matches the recomputation path exactly") {
    // add per-user noise so variances are nonzero
    val ev = (0L until 240L).flatMap { u =>
      val b = (u % 10 + 1) * 100
      val noise = (u % 13) * 7
      val liftU = if (md5arm(u) == 1) 250L else 0L
      Seq((u, "purchase", b / 100.0, pre),
        (u, "purchase", (b + 400 + noise + liftU) / 100.0, post))
    }.toDF("user_id", "event_type", "value", "ts")
    val rows = (0L until 240L).map { u =>
      (md5arm(u), 400L + (u % 13) * 7 + (if (md5arm(u) == 1) 250L else 0L))
    }
    val t1 = rows.filter(_._1 == 1).map(_._2)
    val c1 = rows.filter(_._1 == 0).map(_._2)
    val (nt, nc) = (t1.length.toDouble, c1.length.toDouble)
    val (st, sc) = (t1.sum.toDouble, c1.sum.toDouble)
    val qt = t1.map(d => d.toDouble * d).sum
    val qc = c1.map(d => d.toDouble * d).sum
    val vt = (nt * qt - st * st) / (nt * nt * (nt - 1))
    val vc = (nc * qc - sc * sc) / (nc * nc * (nc - 1))
    val tExp = (st / nt - sc / nc) / math.sqrt(vt + vc)
    val out = DiffInDiff.didTest(ev).collect().head
    assert(math.abs(out.getLong(out.fieldIndex("t_micro"))
      - math.round(1e6 * tExp)) <= 1)
    assert(out.getLong(out.fieldIndex("did_micro")) ===
      math.round(1e6 * (st / nt - sc / nc)))
  }
}
