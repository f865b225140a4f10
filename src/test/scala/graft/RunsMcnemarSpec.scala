package graft

import java.sql.Timestamp
import graft.ext.RaterAgreement
import graft.operators.RunsTest

/** Runs test + McNemar: a perfectly alternating series must reject
  * toward too-many-runs (z > 0), a block series toward too-few
  * (z < 0), with the exact hand moments; McNemar must pin the
  * symmetric-disagreement null and flag a one-sided gate. */
class RunsMcnemarSpec extends SparkSpec {
  import spark.implicits._

  private def at(h: Int) = new Timestamp(
    Timestamp.valueOf("2024-03-01 00:00:00").getTime + h * 3600L * 1000L)

  test("alternating series → max runs, z > 0; blocks → few runs, z < 0") {
    // alternate 5 and 15 events for 60 hours: mean 10, signs alternate
    val alt = (0 until 60).flatMap(h =>
      Seq.fill(if (h % 2 == 0) 5 else 15)(("a", at(h))))
      .toDF("event_type", "ts")
    val r = RunsTest.runsTest(alt).collect().head
    assert(r.getLong(r.fieldIndex("n_hours")) === 60L)
    assert(r.getLong(r.fieldIndex("n_above")) === 30L)
    assert(r.getLong(r.fieldIndex("runs")) === 60L)
    // hand moments: E[R] = 1 + 2·30·30/60 = 31; Var = 1800·1740/
    // (3600·59); z = (60−31)/sqrt(...)
    val varR = 1800.0 * 1740.0 / (3600.0 * 59.0)
    val z = math.round(1e6 * 29.0 / math.sqrt(varR))
    assert(r.getLong(r.fieldIndex("z_micro")) === z)
    assert(!r.getBoolean(r.fieldIndex("random_ok")))
    // two blocks: 30 low then 30 high → 2 runs, z < 0
    val blk = (0 until 60).flatMap(h =>
      Seq.fill(if (h < 30) 5 else 15)(("b", at(h))))
      .toDF("event_type", "ts")
    val rb = RunsTest.runsTest(blk).collect().head
    assert(rb.getLong(rb.fieldIndex("runs")) === 2L)
    assert(rb.getLong(rb.fieldIndex("z_micro")) < 0L)
    // constant series: degenerate variance → z pinned 0, random_ok
    val cst = (0 until 30).flatMap(h => Seq.fill(7)(("c", at(h))))
      .toDF("event_type", "ts")
    val rc = RunsTest.runsTest(cst).collect().head
    assert(rc.getLong(rc.fieldIndex("z_micro")) === 0L)
  }

  test("mcnemar: symmetric discordance → stat (b−c)²/(b+c) exactly") {
    import org.apache.spark.sql.functions._
    def cells(kk: Long, kd: Long, dk: Long, dd: Long) =
      Seq((kk, kd, dk, dd)).toDF("kk", "kd", "dk", "dd")
    // b = c → stat 0, not asymmetric
    val sym = RaterAgreement.mcnemarFromCells(cells(50, 10, 10, 30))
      .collect().head
    assert(sym.getLong(sym.fieldIndex("stat_micro")) === 0L)
    assert(!sym.getBoolean(sym.fieldIndex("asymmetric")))
    // b = 16, c = 2: stat = 14²/18 = 10.888… > 3.84 → asymmetric
    val asym = RaterAgreement.mcnemarFromCells(cells(50, 16, 2, 30))
      .collect().head
    assert(asym.getLong(asym.fieldIndex("stat_micro")) ===
      math.round(1e6 * 14.0 * 14.0 / 18.0))
    assert(asym.getBoolean(asym.fieldIndex("asymmetric")))
    // no discordance at all → guarded 0
    val none = RaterAgreement.mcnemarFromCells(cells(50, 0, 0, 30))
      .collect().head
    assert(none.getLong(none.fieldIndex("stat_micro")) === 0L)
  }
}
