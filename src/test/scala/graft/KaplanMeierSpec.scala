package graft

import graft.operators.KaplanMeier

/** Kaplan-Meier: the life table must match a hand-rolled sequential
  * product-limit computation, censored subjects must leave the risk
  * set without dropping the curve, and risk-set exhaustion must pin
  * S to exact zero (NULL log) rather than NaN. */
class KaplanMeierSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  // (f_us, l_us, p_us): p null = censored at l
  private def frame(rows: Seq[(Long, Long, Option[Long])]) =
    rows.map { case (f, l, p) => (f, l, p.map(java.lang.Long.valueOf).orNull) }
      .toDF("f_us", "l_us", "p_us")
      .selectExpr("f_us", "l_us", "cast(p_us as bigint) as p_us")

  test("matches the sequential product-limit estimate with censoring") {
    // events at day 1 (x2), day 2 (x1); censored at day 1 (x1), day 3
    // (x1); one more event at day 3
    val rows = Seq[(Long, Long, Option[Long])](
      (0L, 5 * day, Some(1 * day)), (0L, 9 * day, Some(1 * day + 7)),
      (0L, 1 * day + 1, None),
      (0L, 9 * day, Some(2 * day + 5)),
      (0L, 3 * day + 9, None),
      (0L, 9 * day, Some(3 * day + 1)))
    val out = KaplanMeier.lifeTable(frame(rows)).collect()
    // life table: t=1: n=6 d=2 c=1; t=2: n=3 d=1; t=3: n=2 d=1 c=1
    val expect = Seq(
      (1L, 6L, 2L, 1L), (2L, 3L, 1L, 0L), (3L, 2L, 1L, 1L))
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === expect)
    // survival replay with the operator's own per-term quantization
    var cum = 0L
    val want = expect.map { case (_, n, d, _) =>
      cum += math.round(1e6 * math.log(1.0 - d.toDouble / n))
      (cum, math.exp(cum / 1e6))
    }
    out.zip(want).foreach { case (r, (lg, s)) =>
      assert(r.getLong(r.fieldIndex("log_s_micro")) === lg)
      assert(math.abs(r.getDouble(r.fieldIndex("s")) - s) < 1e-12)
    }
    // and the un-quantized sanity: S(3) = (1-2/6)(1-1/3)(1-1/2) = 2/9
    assert(math.abs(out.last.getDouble(out.last.fieldIndex("s")) - 2.0 / 9)
      < 1e-4)
  }

  test("risk-set exhaustion pins S to exact zero, never NaN") {
    val rows = Seq[(Long, Long, Option[Long])](
      (0L, 9 * day, Some(1 * day)),
      (0L, 9 * day, Some(2 * day)),
      (0L, 9 * day, Some(2 * day + 3)))
    val out = KaplanMeier.lifeTable(frame(rows)).collect()
    val last = out.last
    assert(last.getLong(last.fieldIndex("d_event")) === 2L)
    assert(last.getLong(last.fieldIndex("n_risk")) === 2L)
    assert(last.isNullAt(last.fieldIndex("log_s_micro")))
    assert(last.getDouble(last.fieldIndex("s")) === 0.0)
    assert(!out.exists(r => r.getDouble(r.fieldIndex("s")).isNaN))
  }

  test("production query: monotone curve, risk set telescopes exactly") {
    val out = KaplanMeier.qKaplanMeier(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val s = out.map(_.getDouble(5))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
    // n_risk(i+1) = n_risk(i) - d(i) - c(i) over the observed grid
    out.zip(out.tail).foreach { case (a, b) =>
      assert(b.getLong(1) === a.getLong(1) - a.getLong(2) - a.getLong(3))
    }
  }
}
