package graft

import graft.ext.WordDispersion
import graft.operators.{FactorialAb, Icc}

/** ICC/DEFF, the 2×2 factorial, and the word-distribution lenses:
  * closed forms — zero within-cluster variance pins ICC to 1 and
  * no between-cluster signal pins it to ~0; a pure additive cell
  * layout pins the interaction to exactly 0 while a planted synergy
  * reproduces the hand contrast; a perfectly proportional word pins
  * DP to 0 and a single-source word to 1 − t_s/T. */
class IccFactorialSpec extends SparkSpec {
  import spark.implicits._

  test("icc: identical values within users, distinct across → ICC 1") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-03-01 00:00:00")
    // user u contributes 4 events all of value u dollars
    val ev = (1 to 10).flatMap(u => (1 to 4).map(_ =>
      (u.toLong, ts, "purchase", u * 1.0))).toSeq
      .toDF("user_id", "ts", "event_type", "value")
    val r = Icc.icc(ev).collect().head
    assert(r.getLong(r.fieldIndex("icc_micro")) === 1000000L)
    // DEFF = 1 + (4−1)·1 = 4
    assert(r.getLong(r.fieldIndex("deff_micro")) === 4000000L)
    // identical values EVERYWHERE: SSB = 0 → ICC pinned 0 (guarded)
    val flat = (1 to 10).flatMap(u => (1 to 4).map(_ =>
      (u.toLong, ts, "purchase", 5.0))).toSeq
      .toDF("user_id", "ts", "event_type", "value")
    val r2 = Icc.icc(flat).collect().head
    assert(r2.getLong(r2.fieldIndex("icc_micro")) === 0L)
  }

  test("factorial: additive cells → interaction exactly 0; " +
    "synergy → hand contrast") {
    def pu(m00: Long, m01: Long, m10: Long, m11: Long) =
      (Seq.tabulate(20)(i => (0, 0, m00 + (i % 2))) ++
        Seq.tabulate(20)(i => (0, 1, m01 + (i % 2))) ++
        Seq.tabulate(20)(i => (1, 0, m10 + (i % 2))) ++
        Seq.tabulate(20)(i => (1, 1, m11 + (i % 2))))
        .toDF("a", "b", "cents")
    // additive: m11 − m10 = m01 − m00 = 10 → interaction 0
    val add = FactorialAb.factorialFromPerUser(pu(100, 110, 120, 130))
      .collect().head
    assert(add.getLong(add.fieldIndex("int_micro")) === 0L)
    assert(!add.getBoolean(add.fieldIndex("interaction_sig")))
    assert(add.getLong(add.fieldIndex("a_effect_micro")) === 20000000L)
    assert(add.getLong(add.fieldIndex("b_effect_micro")) === 10000000L)
    // synergy: m11 boosted by +40 → interaction exactly 40
    val syn = FactorialAb.factorialFromPerUser(pu(100, 110, 120, 170))
      .collect().head
    assert(syn.getLong(syn.fieldIndex("int_micro")) === 40000000L)
    assert(syn.getBoolean(syn.fieldIndex("interaction_sig")))
  }

  test("dispersion: proportional word → DP 0; confined word → 1 − t/T") {
    // two sources, 80 and 20 tokens; 'even' appears 16/4
    // (proportional), 'conf' appears 30/0 (confined to the big one)
    def words(n: Int, w: String) = Seq.fill(n)(w)
    val docs = Seq(
      (1L, (words(30, "conf") ++ words(16, "even") ++
        words(34, "pad")).mkString(" "), "sA"),
      (2L, (words(4, "even") ++ words(16, "pad")).mkString(" "), "sB"))
      .toDF("doc_id", "text", "source")
    val out = WordDispersion.wordDispersion(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val even = out("even")
    assert(even.getLong(even.fieldIndex("dp_micro")) === 0L)
    val conf = out("conf")
    assert(conf.getLong(conf.fieldIndex("dp_micro")) ===
      math.round(1e6 * 0.2)) // 1 − 80/100
  }
}
