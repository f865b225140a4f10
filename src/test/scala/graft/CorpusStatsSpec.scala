package graft

import java.sql.Timestamp
import graft.ext.{ChaoRichness, FightinWords}
import graft.operators.{ExtremeValue, OddsRatio}

/** Odds ratio, fightin' words, Chao richness, extreme value: closed
  * forms on hand frames — a null 2×2 pins OR = RR = 1 and an
  * all-hapax source pins Chao1 and the unseen mass; the Gumbel fit
  * matches a hand moment computation; the discriminating word tops
  * its side. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("odds ratio: null table → OR = RR = 1, not significant; " +
    "zero cell surfaces or_defined = false") {
    import org.apache.spark.sql.functions._
    val m = graft.operators.AbTest.convMin.toLong
    def pu(a: Long, b: Long, c: Long, d: Long) =
      (Seq.fill(a.toInt)((1, m)) ++ Seq.fill(b.toInt)((1, 0L)) ++
        Seq.fill(c.toInt)((0, m)) ++ Seq.fill(d.toInt)((0, 0L)))
        .toDF("arm", "purchases")
    val nul = OddsRatio.oddsFromPerUser(pu(20, 30, 20, 30)).collect().head
    assert(nul.getLong(nul.fieldIndex("or_micro")) === 1000000L)
    assert(nul.getLong(nul.fieldIndex("rr_micro")) === 1000000L)
    assert(!nul.getBoolean(nul.fieldIndex("significant")))
    // hand case: a=40 b=10 c=10 d=40 → OR = 16, RR = 0.8/0.2 = 4
    val big = OddsRatio.oddsFromPerUser(pu(40, 10, 10, 40)).collect().head
    assert(big.getLong(big.fieldIndex("or_micro")) === 16000000L)
    assert(big.getLong(big.fieldIndex("rr_micro")) === 4000000L)
    assert(big.getBoolean(big.fieldIndex("significant")))
    val zero = OddsRatio.oddsFromPerUser(pu(0, 50, 20, 30)).collect().head
    assert(!zero.getBoolean(zero.fieldIndex("or_defined")))
    assert(zero.getLong(zero.fieldIndex("or_micro")) === 0L)
  }

  test("fightin words: the planted discriminator tops its side") {
    val docs = (
      (1 to 12).map(i => (i.toLong, "zebra walks home", "src1")) ++
      (1 to 12).map(i => (100L + i, "quokka walks home", "src11")))
      .toDF("doc_id", "text", "source")
    val out = FightinWords.fightinWords(docs).collect()
    val aTop = out.filter(_.getString(4) == "a")
      .maxBy(_.getLong(3))
    val bTop = out.filter(_.getString(4) == "b")
      .minBy(_.getLong(3))
    assert(aTop.getString(0) === "zebra")
    assert(bTop.getString(0) === "quokka")
    // shared words carry |z| below the discriminators
    assert(out.filter(r => r.getString(0) == "walks")
      .forall(r => math.abs(r.getLong(3)) <
        math.abs(aTop.getLong(3))))
  }

  test("chao richness: all-hapax pins Chao1 = V + V(V−1)/2; " +
    "doubled corpus kills the hapax mass") {
    val hapax = Seq((1L, "alpha beta gamma delta", "s"))
      .toDF("doc_id", "text", "source")
    val r = ChaoRichness.chaoRichness(hapax).collect().head
    assert(r.getLong(r.fieldIndex("vocab")) === 4L)
    assert(r.getLong(r.fieldIndex("f1")) === 4L)
    assert(r.getLong(r.fieldIndex("f2")) === 0L)
    // Chao1 = 4 + 4·3/2 = 10; unseen mass = 4/4 = 1
    assert(r.getLong(r.fieldIndex("chao1_micro")) === 10000000L)
    assert(r.getLong(r.fieldIndex("unseen_mass_micro")) === 1000000L)
    val doubled = Seq(
      (1L, "alpha beta gamma delta", "s"),
      (2L, "alpha beta gamma delta", "s"))
      .toDF("doc_id", "text", "source")
    val r2 = ChaoRichness.chaoRichness(doubled).collect().head
    assert(r2.getLong(r2.fieldIndex("f1")) === 0L)
    assert(r2.getLong(r2.fieldIndex("chao1_micro")) === 4000000L)
    assert(r2.getLong(r2.fieldIndex("unseen_mass_micro")) === 0L)
  }

  test("extreme value: hand moments reproduce the Gumbel fit") {
    def at(h: Int) = new Timestamp(
      Timestamp.valueOf("2024-03-01 00:00:00").getTime
        + h * 3600L * 1000L)
    // 4 days; daily max hourly counts 10, 20, 10, 20 (hour 5 spikes)
    val ev = (0 until 96).flatMap { h =>
      val base = 3
      val spike = if (h % 24 == 5) (if ((h / 24) % 2 == 0) 10 else 20)
        else base
      Seq.fill(spike)(("a", at(h)))
    }.toDF("event_type", "ts")
    val r = ExtremeValue.extremeValue(ev).collect().head
    assert(r.getLong(r.fieldIndex("n_days")) === 4L)
    assert(r.getLong(r.fieldIndex("max_seen")) === 20L)
    assert(r.getLong(r.fieldIndex("sx")) === 60L)
    assert(r.getLong(r.fieldIndex("sxx")) === 1000L)
    val mean = 15.0
    val varr = (1000.0 / 4 - mean * mean) * 4 / 3.0
    val beta = math.sqrt(varr) * 0.779696801
    val mu = mean - 0.577215665 * beta
    assert(r.getLong(r.fieldIndex("beta_micro")) ===
      math.round(1e6 * beta))
    assert(r.getLong(r.fieldIndex("mu_micro")) === math.round(1e6 * mu))
    val gq = math.log(-math.log(1.0 - 1.0 / ExtremeValue.returnDays))
    assert(r.getLong(r.fieldIndex(s"rl${ExtremeValue.returnDays}_micro"))
      === math.round(1e6 * (mu - beta * gq)))
    // return level exceeds the mean daily max (it's a tail quantile)
    assert(r.getLong(r.fieldIndex(s"rl${ExtremeValue.returnDays}_micro"))
      > r.getLong(r.fieldIndex("max_mean_micro")))
  }
}
