package graft

import graft.operators.TukeyHsd

/** Tukey-Kramer HSD: a planted far-out group must flag against every
  * other group while the near-identical rest stay unflagged; the
  * fence must match the hand formula on exact per-group stats. */
class TukeyHsdSpec extends SparkSpec {
  import spark.implicits._

  test("only the planted outlier group's pairs flag") {
    // 4 groups of 30: a/b/c identical distributions at 100, d at 300
    def g(name: String, base: Long) =
      (0 until 30).map(i => (name, base + (i % 3)))
    val df = (g("a", 100L) ++ g("b", 100L) ++ g("c", 100L) ++
      g("d", 300L)).toDF("g", "y")
    val out = TukeyHsd.tukeyHsd(df).collect()
    assert(out.length === 6) // C(4,2)
    out.foreach { r =>
      val pair = (r.getString(0), r.getString(1))
      val sig = r.getBoolean(r.fieldIndex("significant"))
      if (pair._2 == "d") assert(sig, s"$pair should flag")
      else assert(!sig, s"$pair should not flag")
    }
    // fence replay: MSW from the exact group stats (ordered fold)
    val groups = Seq("a", "b", "c", "d").map { name =>
      val ys = df.filter($"g" === name).collect().map(_.getLong(1))
      (ys.length, ys.sum, ys.map(y => y.toDouble * y).sum,
        ys.sum.toDouble)
    }
    var cum = 0.0
    groups.foreach { case (n, s, _, _) => cum += s.toDouble * s / n }
    val nAll = groups.map(_._1).sum
    val qAll = groups.map(_._3).sum
    val msw = (qAll - cum) / (nAll - groups.length)
    val hand = math.round(5.01 * math.sqrt(msw / 2.0 *
      (1.0 / 30 + 1.0 / 30)) * 1e6)
    assert(out.head.getLong(out.head.fieldIndex("hsd_micro")) === hand)
  }
}
