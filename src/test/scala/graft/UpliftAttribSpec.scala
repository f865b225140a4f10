package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Anonymity, Hits, ShapleyAttrib, Uplift}

/** Qini uplift curve, Shapley channel attribution, integer HITS, and
  * t-closeness — the round-14 session-4 analytics wave. */
class UpliftAttribSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def puDf(rows: Seq[(Long, Long, Long, Long)]) = {
    val schema = StructType(Seq(
      StructField("user_id", LongType, false),
      StructField("arm", LongType, false),
      StructField("conv", LongType, false),
      StructField("score", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2, r._3, r._4)), 2), schema)
  }

  test("qini: hand-computed 4-user curve, empty-control guard, exact coefficient") {
    // ranked by score desc: (t,conv) (c,0) (t,0) (c,0)
    val pu = puDf(Seq((1L, 1L, 1L, 10L), (2L, 0L, 0L, 9L),
      (3L, 1L, 0L, 1L), (4L, 0L, 0L, 0L)))
    val out = Uplift.qiniFromPerUser(pu).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    // decile 1 holds only the treated converter: cum_nc = 0 → guard
    assert(out(1).getAs[Long]("qini_micro") === 0L)
    assert(out(3).getAs[Long]("qini_micro") === 1000000L)
    assert(out(6).getAs[Long]("qini_micro") === 1000000L)
    assert(out(8).getAs[Long]("qini_micro") === 1000000L)
    // coefficient: 3e6 div 10 − 1e6 div 2
    assert(out.values.head.getAs[Long]("qini_coef_micro") === -200000L)
  }

  test("qini: targeting-ordered scores bow the curve above a conversion-blind ranking") {
    // 40 users; treated converters iff score >= 30 (persuadables first)
    val rows = (1L to 40L).map { u =>
      val arm = u % 2
      val score = 41L - u
      val conv = if (arm == 1 && score >= 30) 1L else 0L
      (u, arm, conv, score)
    }
    val curve = Uplift.qiniFromPerUser(puDf(rows)).collect()
    val byDec = curve.map(r =>
      r.getAs[Long]("decile") -> r.getAs[Long]("qini_micro")).toMap
    // all incremental conversions are captured by decile 3; the curve
    // then stays flat at its maximum
    assert(byDec(3) === byDec(10))
    assert(byDec(3) > 0)
    // coefficient strictly positive: area above the diagonal
    assert(curve.head.getAs[Long]("qini_coef_micro") > 0)
  }

  test("qini driver pipeline: arms balanced-ish, one row per non-empty decile") {
    val pu = Uplift.perUserUplift(graft.Tables(spark, dir, "events"))
    assert(pu.filter(!col("arm").isin(0L, 1L)).count() === 0)
    val out = Uplift.qQini(spark, dir).collect()
    assert(out.length === 10)
    assert(out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum
      === pu.count())
  }

  private def maskDf(rows: Seq[(Long, Long)]) = {
    val schema = StructType(Seq(StructField("mask", LongType, false),
      StructField("conv", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("shapley: dummy channel gets zero, lone driver gets everything") {
    // two converters exposed to click only, one unexposed converter
    val out = ShapleyAttrib.shapleyFromMasks(
        maskDf(Seq((1L, 1L), (1L, 1L), (0L, 1L))))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("phi_f")).toMap
    assert(out("click") === 48L) // 24 · (marginal 2 conversions)
    assert(out("signup") === 0L)
    assert(out("error") === 0L)
    assert(out("view") === 0L)
  }

  test("shapley: symmetric channels split credit equally; efficiency holds") {
    // one converter exposed to click+signup (mask 3): half each
    val rows = ShapleyAttrib.shapleyFromMasks(maskDf(Seq((3L, 1L))))
      .collect()
    val out = rows.map(r => r.getString(0) -> r.getAs[Long]("phi_f")).toMap
    assert(out("click") === 12L)
    assert(out("signup") === 12L)
    assert(out("click") === out("signup"))
    // Σφ·24 = 24·(v(C) − v(∅)) = 24·(1 − 0)
    assert(rows.map(_.getAs[Long]("phi_f")).sum === 24L)
  }

  test("shapley driver query: efficiency identity on real events") {
    val rows = ShapleyAttrib.qShapleyChannels(spark, dir).collect()
    assert(rows.length === 4)
    val masks = ShapleyAttrib.exposureMasks(
      graft.Tables(spark, dir, "events"))
    val vFull = masks.filter(col("conv") === 1L).count()
    val vEmpty = masks.filter(col("conv") === 1L && col("mask") === 0L)
      .count()
    assert(rows.map(_.getAs[Long]("phi_f")).sum === 24L * (vFull - vEmpty))
    // shares sum to ~1e6 (integer-division truncation only)
    val shares = rows.map(_.getAs[Long]("share_micro")).sum
    assert(shares > 999996L && shares <= 1000000L)
  }

  private def liDf(rows: Seq[(Long, Long)]) = {
    val schema = StructType(Seq(StructField("l_orderkey", LongType, false),
      StructField("l_partkey", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("hits: star graph — the low-key center is the hub, leaves split authority") {
    // order 10 buys {1,2}, order 11 buys {1,3} → oriented 1→2, 1→3
    val li = liDf(Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L)))
    val out = Hits.hits(li).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r).toMap
    val mass = Hits.hitsMass
    assert(out(1L).getAs[Long]("hub") === mass)
    assert(out(1L).getAs[Long]("auth") === 0L)
    assert(out(2L).getAs[Long]("auth") === mass / 2)
    assert(out(3L).getAs[Long]("auth") === mass / 2)
    assert(out(2L).getAs[Long]("hub") === 0L)
  }

  test("hits driver query: both scores conserve total mass up to truncation") {
    val rows = Hits.qHits(spark, dir).collect()
    val n = rows.length
    val hubSum = rows.map(_.getAs[Long]("hub")).sum
    val authSum = rows.map(_.getAs[Long]("auth")).sum
    val mass = Hits.hitsMass
    // each normalized half-step truncates < 1 unit per node
    assert(hubSum <= mass && hubSum > mass - n)
    assert(authSum <= mass && authSum > mass - n)
  }

  private def sensDf(rows: Seq[(String, Long)]) = {
    val schema = StructType(Seq(StructField("g", StringType, false),
      StructField("s", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("t-closeness: global-matching class scores 0; disjoint halves score 1/2") {
    // A all s=0, B all s=1 → each class EMD = 1/2 under m=2
    val split = Anonymity.tClosenessProfile(
        sensDf(Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L))),
        Seq("g"), "s")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("t_micro")).toMap
    assert(split("A") === 500000L)
    assert(split("B") === 500000L)
    // both classes mirror the global 50/50 → t = 0 exactly
    val mirror = Anonymity.tClosenessProfile(
        sensDf(Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))),
        Seq("g"), "s")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("t_micro")).toMap
    assert(mirror("A") === 0L)
    assert(mirror("B") === 0L)
  }

  test("t-closeness driver query: one row per k-anonymity class, t in [0, 1e6]") {
    val rows = Anonymity.qTCloseness(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val t = r.getAs[Long]("t_micro"); t >= 0L && t <= 1000000L })
  }
}
