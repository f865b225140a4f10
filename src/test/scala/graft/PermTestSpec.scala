package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import graft.operators.{AbTest, PermTest}

/** Permutation test: the distributed fan-out must equal a full JVM
  * replay of all seeded re-assignments, and a planted arm effect must
  * drive the p-value to its floor. */
class PermTestSpec extends SparkSpec {
  import spark.implicits._

  private def md5mod2(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
  }

  private def syntheticEvents(n: Long) =
    (0L until n).flatMap { u =>
      Seq.fill(14)((u, "purchase", (u % 9 + 1) * 1.5)) :+
        ((u, "click", 0.5))
    }.toDF("user_id", "event_type", "value")

  test("matches a full JVM replay of every seeded re-assignment") {
    val ev = syntheticEvents(120)
    val pu = AbTest.perUserArm(ev).select("user_id", "arm", "cents")
      .as[(Long, Long, Long)].collect()
    def effect(assign: Long => Long): Long = {
      val t = pu.filter(r => assign(r._1) == 1)
      val c = pu.filter(r => assign(r._1) == 0)
      math.round(1e6 * (t.map(_._3).sum.toDouble / t.length
        - c.map(_._3).sum.toDouble / c.length))
    }
    val obs = effect(u => md5mod2(u.toString))
    val deltas = (1 to PermTest.permB).map { b =>
      effect(u => md5mod2(s"${PermTest.salt}:$b:$u"))
    }
    val nExtreme = deltas.count(d => math.abs(d) >= math.abs(obs)).toLong
    val p = math.round(1e6 * (1.0 + nExtreme) / (1 + PermTest.permB))

    val out = PermTest.permTest(ev).collect().head
    assert(out.getLong(out.fieldIndex("b_total")) === PermTest.permB.toLong)
    assert(out.getLong(out.fieldIndex("obs_micro")) === obs)
    assert(out.getLong(out.fieldIndex("n_extreme")) === nExtreme)
    assert(out.getLong(out.fieldIndex("p_micro")) === p)
  }

  test("planted arm effect drives p to the floor 1/(B+1)") {
    // arm-1 users (by the REAL md5 coin) spend 100x: no re-draw can
    // reproduce the alignment, so nothing is as extreme as observed
    val ev = (0L until 200L).flatMap { u =>
      val mult = if (md5mod2(u.toString) == 1) 100.0 else 1.0
      Seq.fill(14)((u, "purchase", mult)) :+ ((u, "click", 0.5))
    }.toDF("user_id", "event_type", "value")
    val out = PermTest.permTest(ev).collect().head
    assert(out.getLong(out.fieldIndex("n_extreme")) === 0L)
    assert(out.getLong(out.fieldIndex("p_micro")) ===
      math.round(1e6 / (1.0 + PermTest.permB)))
    assert(out.getBoolean(out.fieldIndex("significant")))
  }
}
