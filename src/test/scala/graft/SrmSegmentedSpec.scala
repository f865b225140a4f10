package graft

import java.sql.Timestamp
import graft.operators.SrmSegmented

/** Segmented SRM + overdispersion: a planted one-segment imbalance
  * flags ONLY that segment under the Bonferroni fence; a
  * deterministic-count frame pins the dispersion index to its hand
  * value and a constant-count frame to exactly 0 variance. */
class SrmSegmentedSpec extends SparkSpec {
  import spark.implicits._

  private def at(min: Int) = new Timestamp(
    Timestamp.valueOf("2024-03-01 00:00:00").getTime + min * 60000L)

  test("segmented srm: the planted imbalance flags its segment only") {
    // arm is md5-derived, so plant the imbalance by SELECTING user
    // ids per arm: segment 'view' gets 60 arm-1 users and 5 arm-0;
    // segment 'click' gets 30/30 (balanced).
    // driver-side replica of AbTest.armOf (md5 hex digits 1-15 % 2)
    val arm = (u: Long) => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
    }
    val ids = (1L to 2000L)
    val arm1 = ids.filter(arm(_) == 1L).take(90)
    val arm0 = ids.filter(arm(_) == 0L).take(35)
    val ev = (
      arm1.take(60).map(u => (u, "view", at(1))) ++
      arm0.take(5).map(u => (u, "view", at(1))) ++
      arm1.drop(60).take(30).map(u => (u, "click", at(1))) ++
      arm0.drop(5).take(30).map(u => (u, "click", at(1))))
      .toDF("user_id", "event_type", "ts")
    val out = SrmSegmented.srmSegmented(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("view").getBoolean(out("view").fieldIndex("srm_detected")))
    assert(!out("click")
      .getBoolean(out("click").fieldIndex("srm_detected")))
    // chi2 for view: (60−5)²/65
    assert(out("view").getLong(out("view").fieldIndex("chi2_micro")) ===
      math.round(1e6 * 55.0 * 55.0 / 65.0))
  }

  test("overdispersion: hand moments; constant counts → z pinned") {
    def ev(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (k, u) => (1 to k).map(i => (u.toLong, at(i)))
    }.toDF("user_id", "ts")
    // counts 1,3 over 2 users: mean 2, var 2 → D = 1
    val r = SrmSegmented.overdispersion(ev(Seq(1, 3))).collect().head
    assert(r.getLong(r.fieldIndex("dispersion_micro")) === 1000000L)
    // constant counts: var 0 → D 0, z < 0 (underdispersed), flagged
    val rc = SrmSegmented.overdispersion(ev(Seq(4, 4, 4, 4)))
      .collect().head
    assert(rc.getLong(rc.fieldIndex("dispersion_micro")) === 0L)
    assert(rc.getLong(rc.fieldIndex("z_micro")) < 0L)
  }
}
