package graft

import graft.ext.{GainsCurve, SimpsonDiversity}
import graft.operators.CaptureRecapture

/** Gains curve, capture-recapture, Simpson diversity: closed forms —
  * a perfect scorer captures all positives in the first deciles with
  * lift n/pos; disjoint samples blow the Petersen estimate up and
  * identical samples collapse it to the seen count; a single-source
  * language pins D = 0 and eff = 1, a uniform one pins eff = k. */
class GainsFusionSpec extends SparkSpec {
  import spark.implicits._

  test("gains: perfect scorer → top deciles capture everything") {
    // 100 docs, top 20 scores are the 20 positives
    val sl = (1L to 100L).map(i =>
      (i, 1000L - i, if (i <= 20) 1 else 0)).toDF("doc_id", "s", "y")
    val out = GainsCurve.gainsCurve(sl).collect()
    assert(out.length === 10)
    val d2 = out(1)
    assert(d2.getLong(d2.fieldIndex("cum_pos")) === 20L)
    assert(d2.getLong(d2.fieldIndex("gain_micro")) === 1000000L)
    // lift at decile 2 = (20/20)/(20/100) = 5
    assert(d2.getLong(d2.fieldIndex("lift_micro")) === 5000000L)
    // final decile: gain 1, lift 1 exactly
    val dL = out.last
    assert(dL.getLong(dL.fieldIndex("gain_micro")) === 1000000L)
    assert(dL.getLong(dL.fieldIndex("lift_micro")) === 1000000L)
  }

  test("capture-recapture: identical samples → N = seen; " +
    "disjoint → Chapman blow-up") {
    def ev(rows: Seq[(Long, String)]) = rows.toDF("user_id", "event_type")
    // 50 users all both view and click (m = n1 = n2 = 50)
    val same = ev((1L to 50L).flatMap(u =>
      Seq(u -> "view", u -> "click")))
    val r = CaptureRecapture.captureRecapture(same).collect().head
    // Chapman: 51·51/51 − 1 = 50
    assert(r.getLong(r.fieldIndex("n_hat")) === 50L)
    assert(r.getLong(r.fieldIndex("blind_spot")) === 0L)
    // disjoint: 30 viewers, 30 clickers, no overlap → 31·31/1−1 = 960
    val disj = ev((1L to 30L).map(_ -> "view") ++
      (31L to 60L).map(_ -> "click"))
    val r2 = CaptureRecapture.captureRecapture(disj).collect().head
    assert(r2.getLong(r2.fieldIndex("m")) === 0L)
    assert(r2.getLong(r2.fieldIndex("n_hat")) === 960L)
    assert(r2.getLong(r2.fieldIndex("blind_spot")) === 900L)
  }

  test("simpson: one source → D 0 / eff 1; uniform k sources → eff k") {
    val docs = (
      (1 to 8).map(i => (i.toLong, "en", "srcA")) ++ // all one source
      (1 to 4).flatMap(i => Seq(
        (100L + i, "fr", s"src$i"), (200L + i, "fr", s"src$i"))))
      .toDF("doc_id", "lang", "source")
    val out = SimpsonDiversity.simpsonDiversity(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(en.fieldIndex("d_micro")) === 0L)
    assert(en.getLong(en.fieldIndex("eff_sources_micro")) === 1000000L)
    val fr = out("fr") // 4 sources × 2 docs: eff = 64/16 = 4
    assert(fr.getLong(fr.fieldIndex("eff_sources_micro")) === 4000000L)
    // D without replacement: 1 − 4·2·1/(8·7) = 1 − 8/56
    assert(fr.getLong(fr.fieldIndex("d_micro")) ===
      math.round(1e6 * (1.0 - 8.0 / 56.0)))
  }
}
