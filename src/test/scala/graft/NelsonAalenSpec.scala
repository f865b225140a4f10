package graft

import graft.operators.NelsonAalen

/** Nelson-Aalen: the hazard table must match a hand-rolled sequential
  * Σ d/n (and Σ d/n² variance) replay, survive risk-set exhaustion
  * without a NULL/NaN (unlike KM's product limit, H just accumulates),
  * and the Fleming-Harrington curve must dominate the KM curve
  * (exp(−Σd/n) ≥ Π(1−d/n) pointwise). */
class NelsonAalenSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  private def frame(rows: Seq[(Long, Long, Option[Long])]) =
    rows.map { case (f, l, p) => (f, l, p.map(java.lang.Long.valueOf).orNull) }
      .toDF("f_us", "l_us", "p_us")
      .selectExpr("f_us", "l_us", "cast(p_us as bigint) as p_us")

  test("matches the sequential hazard sum with censoring") {
    val rows = Seq[(Long, Long, Option[Long])](
      (0L, 5 * day, Some(1 * day)), (0L, 9 * day, Some(1 * day + 7)),
      (0L, 1 * day + 1, None),
      (0L, 9 * day, Some(2 * day + 5)),
      (0L, 3 * day + 9, None),
      (0L, 9 * day, Some(3 * day + 1)))
    val out = NelsonAalen.hazardTable(frame(rows)).collect()
    // life table: t=1: n=6 d=2 c=1; t=2: n=3 d=1; t=3: n=2 d=1 c=1
    val expect = Seq((1L, 6L, 2L), (2L, 3L, 1L), (3L, 2L, 1L))
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === expect)
    var h = 0L; var v = 0L
    val want = expect.map { case (_, n, d) =>
      h += math.round(1e6 * d.toDouble / n)
      v += math.round(1e12 * d.toDouble / n / n)
      (h, v, math.exp(-h / 1e6))
    }
    out.zip(want).foreach { case (r, (hm, vp, s)) =>
      assert(r.getLong(r.fieldIndex("h_micro")) === hm)
      assert(r.getLong(r.fieldIndex("var_pico")) === vp)
      assert(math.abs(r.getDouble(r.fieldIndex("s_fh")) - s) < 1e-12)
    }
    // un-quantized sanity: H(3) = 2/6 + 1/3 + 1/2 = 7/6
    assert(math.abs(out.last.getLong(out.last.fieldIndex("h_micro"))
      / 1e6 - 7.0 / 6) < 1e-4)
  }

  test("risk-set exhaustion accumulates (no NULL/NaN) and S_FH >= S_KM") {
    val rows = Seq[(Long, Long, Option[Long])](
      (0L, 9 * day, Some(1 * day)),
      (0L, 9 * day, Some(2 * day)),
      (0L, 9 * day, Some(2 * day + 3)))
    val na = NelsonAalen.hazardTable(frame(rows)).collect()
    // t=2 exhausts the risk set: d=2, n=2 → term = 1.0, H = 1/3 + 1
    val last = na.last
    assert(last.getLong(last.fieldIndex("h_micro")) ===
      math.round(1e6 / 3) + 1000000L)
    assert(last.getDouble(last.fieldIndex("s_fh")) > 0.0) // KM hits 0 here
    val km = graft.operators.KaplanMeier.lifeTable(frame(rows)).collect()
    na.zip(km).foreach { case (a, k) =>
      assert(a.getDouble(a.fieldIndex("s_fh"))
        >= k.getDouble(k.fieldIndex("s")) - 1e-9)
    }
  }
}
