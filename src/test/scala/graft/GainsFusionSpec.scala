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

  test("gains round-15: histogram-selection curve ≡ brute row_number " +
    "curve under heavy ties, negative scores, and tiny n") {
    // the rework replaced the global row number with multi-boundary
    // order statistics; this replays the OLD exact-rank formulation
    // driver-side and demands bit-equality across adversarial shapes:
    // dense score ties straddling decile boundaries (forcing the
    // doc_id tie resolution), all-one-score, n < 10, negatives
    val rng = new scala.util.Random(421)
    val shapes: Seq[Seq[(Long, Long, Int)]] = Seq(
      // ~5 distinct scores over 137 rows: every boundary is a tie cut
      (1L to 137L).map(i => (i, (rng.nextInt(5) - 2).toLong,
        rng.nextInt(2))),
      // all rows identical score: rank order IS doc_id order
      (1L to 43L).map(i => (i, 7L, if (i % 3 == 0) 1 else 0)),
      // n < 10: some deciles empty, GROUP BY shape must match
      (1L to 7L).map(i => (i, -i * 1000L, (i % 2).toInt)),
      // n = 1
      Seq((5L, -123456L, 1)),
      // wide magnitudes: multi-level refinement path
      (1L to 211L).map(i => (i, rng.nextLong() % (1L << 40),
        rng.nextInt(2)))
    )
    shapes.zipWithIndex.foreach { case (data, si) =>
      val sl = data.toDF("doc_id", "s", "y")
      val got = GainsCurve.gainsCurve(sl).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      // brute: exact ranks driver-side
      val n = data.size
      val ranked = data.sortBy { case (id, s, _) => (-s, id) }
      val deciles = ranked.zipWithIndex
        .groupBy { case (_, rn0) => rn0.toLong * 10 / n + 1 }
      val tp = data.count(_._3 == 1).toLong
      var cumN = 0L; var cumP = 0L
      val want = deciles.keys.toSeq.sorted.map { d =>
        val rows = deciles(d)
        val nd = rows.size.toLong
        val pd = rows.count(_._1._3 == 1).toLong
        cumN += nd; cumP += pd
        val gain = if (tp == 0) 0L
          else math.round(1000000.0 * cumP.toDouble / tp.toDouble)
        val lift = if (tp == 0 || cumN == 0) 0L
          else math.round(1000000.0 * cumP.toDouble * n.toDouble /
            (cumN.toDouble * tp.toDouble))
        (d, nd, pd, cumN, cumP, gain, lift)
      }
      assert(got.toSeq === want, s"shape $si diverged")
    }
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
