package graft

import org.apache.spark.sql.functions._
import graft.operators.{GroupSeq, RobustEffects, SrmMde, StratEffect, TheilSen}

/** Independent-path checks for the experiment-design & robustness wave:
  * planted constructions whose correct readouts are derivable by hand
  * (the MiSelect lesson — the mirrored oracle proves engine agreement,
  * only an independent construction proves the formula). */
class ExperimentDesignSpec extends SparkSpec {
  import spark.implicits._

  private def pu(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("user_id", "arm", "cents")

  test("SRM: a planted 60/40 split at n=10000 is detected; 50/50 is not") {
    // 6000 vs 4000: chi2 = 2000^2/10000 = 400 >> 3.84
    val bad = SrmMde.srmFromPerUser(
      ((1L to 6000L).map((_, 1L)) ++ (1L to 4000L).map((_, 0L)))
        .toDF("user_id", "arm")).head()
    assert(bad.getAs[Long]("chi2_micro") === 400000000L)
    assert(bad.getAs[Boolean]("srm_detected"))
    val ok = SrmMde.srmFromPerUser(
      ((1L to 5000L).map((_, 1L)) ++ (1L to 5000L).map((_, 0L)))
        .toDF("user_id", "arm")).head()
    assert(ok.getAs[Long]("chi2_micro") === 0L)
    assert(!ok.getAs[Boolean]("srm_detected"))
  }

  test("MDE: hand-computed two-sample formula on a tiny design") {
    // arm 1: {0, 200} (var 20000), arm 0: {100, 100} (var 0)
    // se = sqrt(20000/2 + 0/2) = 100; mde = 2.801585 * 100
    val r = SrmMde.mdeFromPerUser(pu(Seq(
      (1L, 1L, 0L), (2L, 1L, 200L), (3L, 0L, 100L), (4L, 0L, 100L))))
      .head()
    assert(r.getAs[Long]("se_micro") === 100000000L)
    assert(r.getAs[Long]("mde_micro") === 280158500L)
    assert(r.getAs[Long]("effect_micro") === 0L) // means equal: 100 vs 100
    assert(!r.getAs[Boolean]("detectable"))
  }

  test("trimmed mean ignores the whale the raw mean can't") {
    // 20 users/arm at 100 cents; one treated whale at 1,000,000.
    // raw effect ≈ +47619 cents/user; 5% trim drops exactly the top
    // (and bottom) rank of each arm -> trimmed means equal.
    val base = (1L to 20L).map(i => (i, 1L, 100L)) ++
      (21L to 40L).map(i => (i, 0L, 100L))
    val whale = pu(base :+ (41L, 1L, 1000000L))
    val r = RobustEffects.trimmedFromPerUser(whale).head()
    assert(r.getAs[Long]("tdiff_micro") === 0L)
    assert(r.getAs[Long]("kept_t") === 19L) // 21 - 2*floor(21*5/100)=1 each side
    // and the untrimmed difference is enormous (sanity of the bait)
    val naive = whale.groupBy("arm").agg(avg("cents")).collect()
    assert(naive.map(_.getDouble(1)).max > 40000)
  }

  test("QTE deciles are exact order statistics per arm") {
    // arm 1: cents 10,20,...,100; arm 0: cents 5,10,...,50
    val rows = (1L to 10L).map(i => (i, 1L, i * 10L)) ++
      (11L to 20L).map(i => (i - 10L + 100L, 0L, (i - 10L) * 5L))
    val r = RobustEffects.qteFromPerUser(pu(rows))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // p-th decile of n=10 is the ceil(p*10/10)=p-th smallest value
    r.foreach { case (p, qt, qc) =>
      assert(qt === p * 10L, s"q_t at p=$p")
      assert(qc === p * 5L, s"q_c at p=$p")
    }
  }

  test("post-stratification removes a planted confound the naive " +
    "difference reports") {
    // Confound: treatment is over-represented in the high-activity
    // stratum, and activity drives spend; within every stratum the
    // arms are identical -> true effect 0, naive effect > 0.
    val rows = Seq.newBuilder[(Long, Long, Long, Long)] // user, arm, x, y
    var id = 0L
    // low stratum (x=1, y=100): 30 control, 10 treated
    (1 to 30).foreach { _ => id += 1; rows += ((id, 0L, 1L, 100L)) }
    (1 to 10).foreach { _ => id += 1; rows += ((id, 1L, 1L, 100L)) }
    // high stratum (x=9, y=1000): 10 control, 30 treated
    (1 to 10).foreach { _ => id += 1; rows += ((id, 0L, 9L, 1000L)) }
    (1 to 30).foreach { _ => id += 1; rows += ((id, 1L, 9L, 1000L)) }
    val r = StratEffect.stratFromPerUser(
      rows.result().toDF("user_id", "arm", "x", "y")
        .select("arm", "x", "y")).head()
    assert(r.getAs[Long]("naive_micro") > 400000000L) // ~+450 cents
    assert(r.getAs[Long]("strat_micro") === 0L)
    assert(r.getAs[Long]("n_strata_used") === 2L)
  }

  test("group-sequential: OBF boundaries decay as c*sqrt(K/k); a huge " +
    "planted effect crosses at the first look with enrollment") {
    // 400 users enrolled day 1; arm from the md5 coin; treated spend
    // 10000 cents at day 2, control 100 — a massive early effect
    val users = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.operators.AbTest.armOf(col("user_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ev = users.zipWithIndex.flatMap { case ((u, arm), i) =>
      val spend = if (arm == 1) 10000.0 + (i % 7) else 100.0 + (i % 7)
      Seq((u * 10, u, "2024-01-02 01:00:00", "view", 0.0),
        (u * 10 + 1, u, "2024-01-02 02:00:00", "purchase", spend / 100.0))
    }
    val events = ev.toSeq
      .toDF("event_id", "user_id", "tss", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    val out = GroupSeq.groupSeq(events).collect()
    assert(out.length === GroupSeq.looks)
    // boundary values: round(1e6 * 2.040082 * sqrt(5/k))
    val expected = (1 to 5).map(k =>
      math.round(1e6 * 2.040082 * math.sqrt(5.0 / k)))
    assert(out.map(_.getAs[Long]("bound_micro")).toSeq === expected)
    // everyone enrolled before look 1; the effect crosses immediately
    assert(out.forall(_.getAs[Boolean]("crossed")))
    assert(out.head.getAs[Long]("n_t")
      + out.head.getAs[Long]("n_c") === 400L)
    // sanity of the triangle: the first crossed look is the stop time
    val stop = out.filter(_.getAs[Boolean]("crossed"))
      .map(_.getAs[Long]("look")).min
    assert(stop === 1L)
  }

  test("Zipf fit recovers slope -1 on a planted power-law vocabulary") {
    import graft.ext.Zipf
    // word_i appears round(2000/i) times, i = 1..200: a pure Zipf law.
    // Each occurrence is its own doc — zipfFit only reads the corpus
    // frequency table, not document structure.
    val docs = (1 to 200).flatMap { i =>
      Seq.fill(math.max(1, math.round(2000.0 / i).toInt))(s"w$i")
    }.zipWithIndex.map { case (w, id) => (id.toLong, w) }
      .toDF("doc_id", "text")
    val r = Zipf.zipfFit(docs).head()
    val slope = r.getAs[Long]("slope_micro")
    assert(math.abs(slope + 1000000L) < 30000L, s"slope $slope !~ -1e6")
    assert(r.getAs[Long]("r2_micro") > 990000L)
    // the synthetic driver corpus is near-uniform (31 types): the fit
    // honestly reads non-Zipfian — slope shallow, R² tiny
    val real = Zipf.qZipf(spark, "/root/testdata/sf0.001").head()
    assert(real.getAs[Long]("slope_micro") > -400000L)
  }

  test("embedding drift: T reads ~1 on the null split and alarms only " +
    "on the planted shift") {
    import graft.ext.EmbedDrift
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val nullRead = EmbedDrift.embedDrift(emb).collect()
    assert(nullRead.forall(!_.getAs[Boolean]("drifted")),
      "null split must not alarm")
    // plant: shift label 3's CURRENT half (odd vec_id) by +0.5 on
    // every dimension — a real mean shift the monitor exists to catch
    val planted = emb.withColumn("embedding",
      when(col("label") === 3 && col("vec_id") % 2 =!= 0,
        transform(col("embedding"), x => x + lit(0.5f)))
        .otherwise(col("embedding")))
    val read = EmbedDrift.embedDrift(planted).collect()
      .map(r => r.getAs[Number]("label").intValue
        -> r.getAs[Boolean]("drifted")).toMap
    assert(read(3), "planted shift must alarm")
    assert(read.filterNot(_._1 == 3).values.forall(!_),
      "unshifted labels must stay quiet")
  }

  test("RMST is the exact area under a hand-built KM step curve") {
    import graft.operators.Rmst
    // arm 1: events at days 10 and 20 (no censoring, n=2):
    //   S=1 on [0,10): 10 days; S=0.5 on [10,20): 5 days; 0 after
    //   -> RMST = 15 (quantized: s_micro=round(1e6·exp(round(1e6·ln .5)/1e6))
    //      = 500000 -> exactly 15.0)
    // arm 0: one subject censored at day 30: S=1 throughout -> 30
    val pu = Seq(
      (1L, 1L, 10L), (1L, 1L, 20L), // arm, event, t_days
      (0L, 0L, 30L)
    ).toDF("arm", "event", "t_days")
    val r = Rmst.rmstFromPerUser(pu).head()
    assert(r.getAs[Long]("rmst_t_micro") === 15000000L)
    assert(r.getAs[Long]("rmst_c_micro") === 30000000L)
    assert(r.getAs[Long]("diff_micro") === -15000000L)
  }

  test("conformal: the finite-sample quantile rank and the coverage " +
    "guarantee on a planted separable corpus") {
    import graft.ext.Conformal
    // perfectly separable scores: y=1 docs score +10, y=0 docs −10.
    // Every nonconformity is −10, so q̂ = −10 and every eval doc's
    // true label is in its set; the wrong label (score +10 > q̂) never
    // is — coverage exactly 1.0, set size exactly 1.0.
    val inf = (1L to 400L).map { i =>
      val y = (i % 2).toInt
      (i, if (y == 1) 10L else -10L, y)
    }.toDF("doc_id", "score", "y")
    val r = Conformal.conformal(inf).head()
    assert(r.getAs[Long]("q_hat") === -10L)
    assert(r.getAs[Long]("coverage_micro") === 1000000L)
    assert(r.getAs[Long]("avg_set_micro") === 1000000L)
    assert(r.getAs[Long]("frac_both_micro") === 0L)
    assert(r.getAs[Long]("frac_empty_micro") === 0L)
    // the real corpus readout keeps the marginal guarantee: the driver
    // query at sf0.001 must cover ≥ 1 − α − finite-sample slack
    val real = Conformal.qConformal(spark, "/root/testdata/sf0.001").head()
    assert(real.getAs[Long]("coverage_micro") >= 850000L,
      s"coverage ${real.getAs[Long]("coverage_micro")} below 0.85")
  }

  test("Theil-Sen recovers a planted slope through 25% corruption") {
    // y = 7t on hours 0..39, every 4th hour spiked to 900. Hour 0 has
    // zero purchases so the spine carries 39 points: 29 clean + 10
    // spikes. Clean-clean pairs are C(29,2) = 406 of C(39,2) = 741 —
    // a strict majority, so the pairwise-slope median is EXACTLY the
    // planted 7/hour no matter what the spikes do (the breakdown
    // argument; an OLS mean slope would be dragged by every spike).
    val ev = (0L until 40L).flatMap { t =>
      val y = if (t % 4 == 3) 900L else 7L * t
      (0L until y).map(i => (t * 1000 + i, t, "purchase"))
    }
    val events = ev.toDF("event_id", "h", "event_type")
      .select(col("event_id"),
        expr("timestamp_seconds(h * 3600)").as("ts"),
        col("event_type"))
    val spine = TheilSen.hourlySpine(events).orderBy("t").collect()
    assert(spine.length === 39)
    val r = TheilSen.theilSen(events).head()
    assert(r.getAs[Long]("n_pairs") === 741L)
    assert(r.getAs[Long]("slope_micro") === 7000000L)
  }
}
