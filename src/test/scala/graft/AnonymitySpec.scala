package graft

import graft.operators.Anonymity

/** k-anonymity/l-diversity profile: hand-planted equivalence classes
  * give exact risk masses; testdata invariants. */
class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("planted classes: risk masses exact per threshold") {
    // QI classes: A×1 row, B×3 rows, C×10 rows; sensitive: A has 1
    // distinct value, B 3, C 2
    val rows =
      Seq(("A", "s1")) ++
      (1 to 3).map(i => ("B", s"s$i")) ++
      (1 to 10).map(i => ("C", s"s${i % 2}"))
    val df = rows.toDF("qi", "sens")
    val out = Anonymity.kAnonymityProfile(df, Seq("qi"), "sens")
      .collect().map(r => r.getInt(0) -> r).toMap
    // k=2: only A (size 1) is risky → 1 class, 1 row
    assert(out(2).getLong(3) === 1L && out(2).getLong(4) === 1L)
    // k=5: A and B risky → 2 classes, 4 rows
    assert(out(5).getLong(3) === 2L && out(5).getLong(4) === 4L)
    // k=25: all risky → 3 classes, 14 rows, share 1.0
    assert(out(25).getLong(3) === 3L && out(25).getLong(4) === 14L)
    assert(out(25).getDouble(5) === 1.0)
    // k-independent floors repeat on every row
    assert(out.values.forall(r => r.getLong(6) === 1L)) // min class size
    assert(out.values.forall(r => r.getLong(7) === 1L)) // min l (class A)
  }

  test("generalization ladder: every published class reaches k, " +
    "population conserved, cascade is local") {
    import org.apache.spark.sql.functions._
    // nations 0,1 -> region 0; nation 2 -> region 1
    val nation = Seq((0L, 0L), (1L, 0L), (2L, 1L))
      .toDF("n_nationkey", "n_regionkey")
    // planted: one big L0 class (12 rows), one pair of small classes
    // that merge at L1 (6+5 across nations 0/1, same seg+band), one
    // band-straggler that needs L2, and a lone row that rides to L3/L4
    val cust =
      (1 to 12).map(i => (0L, "AUTO", 100.0)) ++
      (1 to 6).map(i => (0L, "BIKE", 100.0)) ++
      (1 to 5).map(i => (1L, "BIKE", 100.0)) ++
      (1 to 4).map(i => (0L, "BIKE", 2100.0)) ++ // L2: other-band leftovers
      (1 to 7).map(i => (1L, "AUTO", 3100.0)) ++ // joins L2 pool under (R0)
      Seq((2L, "SHIP", 9100.0)) // region 1: alone -> full suppression
    val df = cust.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Anonymity.generalizeLadder(df, nation, k = 10).collect()
    // population conserved
    assert(out.map(_.getLong(4)).sum === cust.size.toLong)
    // the >=k guarantee binds every level except full suppression
    assert(out.filter(_.getInt(0) <= 3).forall(_.getLong(4) >= 10L))
    // L0: the 12-row class survives untouched
    assert(out.exists(r => r.getInt(0) === 0 && r.getString(1) === "N0" &&
      r.getString(2) === "AUTO" && r.getLong(4) === 12L))
    // L1: BIKE/B0 merges across nations under R0 (6+5 = 11)
    assert(out.exists(r => r.getInt(0) === 1 && r.getString(1) === "R0" &&
      r.getString(2) === "BIKE" && r.getString(3) === "B0" &&
      r.getLong(4) === 11L))
    // L2 pools seg leftovers... the 4 BIKE/B2 + 7 AUTO/B3 rows can't
    // reach k within their seg pools (4 < 10, 7 < 10), so they ride to
    // L3 under R0 (11 rows >= 10, seg+band suppressed)
    assert(out.exists(r => r.getInt(0) === 3 && r.getString(1) === "R0" &&
      r.getString(2) === "*" && r.getString(3) === "*" &&
      r.getLong(4) === 11L))
    // the lone region-1 row is fully suppressed (L4 carries no QI bits)
    assert(out.exists(r => r.getInt(0) === 4 && r.getString(1) === "*" &&
      r.getLong(4) === 1L))
  }

  test("driver query: generalized table k-safe on testdata") {
    val out = Anonymity.qKGeneralize(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.filter(_.getInt(0) <= 3)
      .forall(_.getLong(4) >= Anonymity.kTarget.toLong))
    // utility ledger: some class should publish below full suppression
    assert(out.exists(_.getInt(0) < 4))
  }

  test("driver query: one row per threshold, monotone risk") {
    val out = Anonymity.qKAnonymity(spark, "/root/testdata/sf0.001")
      .orderBy("k").collect()
    assert(out.length === Anonymity.kThresholds.length)
    // risk mass is monotone non-decreasing in k; shares in [0,1]
    val shares = out.map(_.getDouble(5))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
    // n_rows constant across thresholds (same population)
    assert(out.map(_.getLong(2)).distinct.length === 1)
  }
}
