package graft

import graft.operators.{AbTest, Anonymity, BayesAb}
import graft.ext.Readability

/** Beta-Binomial A/B, entropy ℓ-diversity, and readability: closed
  * forms on hand frames — symmetric arms pin z to 0; a uniform class
  * reaches eff_l = distinct while a degenerate one collapses to 1;
  * a known sentence pins the Flesch counts exactly. */
class BayesReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("bayes: symmetric arms → z 0, not better; separation → better") {
    // purchases >= convMin marks conversion; symmetric counts
    val m = AbTest.convMin.toLong
    val sym = Seq((1, m), (1, 0L), (0, m), (0, 0L))
      .toDF("arm", "purchases")
    val r = BayesAb.bayesFromPerUser(sym).collect().head
    assert(r.getLong(r.fieldIndex("z_micro")) === 0L)
    assert(r.getLong(r.fieldIndex("lift_micro")) === 0L)
    assert(!r.getBoolean(r.fieldIndex("t_better_95")))
    // posterior mean with s=1, n=2: (1+1)/(2+2) = 0.5
    assert(r.getLong(r.fieldIndex("mean_t_micro")) === 500000L)
    // decisive separation: 40/40 convert in T, 0/40 in C
    val sep = ((1 to 40).map(_ => (1, m)) ++ (1 to 40).map(_ => (0, 0L)))
      .toDF("arm", "purchases")
    val r2 = BayesAb.bayesFromPerUser(sep).collect().head
    assert(r2.getBoolean(r2.fieldIndex("t_better_95")))
    assert(r2.getLong(r2.fieldIndex("z_micro")) > BayesAb.zOneSided95Micro)
  }

  test("l-diversity: uniform class → eff_l = distinct; degenerate → 1") {
    val df = (Seq.fill(4)((1L, "MKT", 1L)) ++ // 4 rows, one value
      Seq((2L, "MKT", 1L), (2L, "MKT", 2L), (2L, "MKT", 3L),
        (2L, "MKT", 4L))) // 4 rows, 4 values
      .toDF("c_nationkey", "c_mktsegment", "bal_band")
    val out = Anonymity.lDiversityProfile(df,
      Seq("c_nationkey", "c_mktsegment"), "bal_band")
      .collect().sortBy(_.getLong(0))
    val deg = out(0)
    assert(deg.getLong(deg.fieldIndex("distinct_l")) === 1L)
    assert(deg.getLong(deg.fieldIndex("entropy_micro")) === 0L)
    assert(deg.getLong(deg.fieldIndex("eff_l_micro")) === 1000000L)
    val uni = out(1)
    assert(uni.getLong(uni.fieldIndex("distinct_l")) === 4L)
    // uniform over 4: entropy = ln 4, eff_l = 4 (quantization-exact:
    // 4 identical terms of round(1e6·(1/4)ln4) sum to 4·346574)
    assert(uni.getLong(uni.fieldIndex("entropy_micro")) === 4L *
      math.round(1e6 * 0.25 * math.log(4.0)))
    assert(math.abs(uni.getLong(uni.fieldIndex("eff_l_micro"))
      - 4000000L) < 100L)
  }

  test("readability: hand sentence pins the exact counts") {
    // "the cat sat. it ran away!" → 6 words, 2 sentences,
    // vowel groups: e,a,a,i,a,a,ay → the(1) cat(1) sat.(1) it(1)
    // ran(1) away!(2) = 7 syllables
    val docs = Seq(("s1", "the cat sat. it ran away!"))
      .toDF("source", "text")
    val r = Readability.readability(docs).collect().head
    assert(r.getLong(r.fieldIndex("n_words")) === 6L)
    assert(r.getLong(r.fieldIndex("n_sentences")) === 2L)
    assert(r.getLong(r.fieldIndex("n_syllables")) === 7L)
    // FRE = 206.835 − 1.015·3 − 84.6·(7/6)
    val fre = 206.835 - 1.015 * 3.0 - 84.6 * (7.0 / 6.0)
    assert(r.getLong(r.fieldIndex("flesch_micro")) ===
      math.round(1e6 * fre))
    // a no-punctuation fragment still counts 1 sentence (floor)
    val frag = Seq(("s1", "no end mark here")).toDF("source", "text")
    val r2 = Readability.readability(frag).collect().head
    assert(r2.getLong(r2.fieldIndex("n_sentences")) === 1L)
  }
}
