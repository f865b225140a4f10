package graft

import org.apache.spark.sql.functions._
import graft.operators.{AbTest, Cuped, DiffInDiff, GroupSeq, PermTest, RobustEffects, Sprt, SrmMde, StratEffect}
import graft.streaming.ExperimentStore

/** Streaming experiment store: every live readout (chi²/Welch,
  * Mann-Whitney, CUPED, DiD, permutation, SPRT) equals its batch
  * operator over the absorbed events at every point — including users
  * whose events are split across batches (the per-user sum monoid is
  * what's under test) — replay is idempotent, compaction inert. */
class ExperimentStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def events = Tables(spark, dir, "events")

  test("every live readout == its batch test; replay idempotent; " +
    "compaction inert") {
    val tmp = java.nio.file.Files.createTempDirectory("expstore")
      .toFile.getAbsolutePath
    // split by EVENT id so one user's events land in several batches:
    // the served statistics are right only if the per-user deltas
    // merge correctly across dirs
    val parts = (0 until 3).map(i =>
      events.filter(abs(hash(col("event_id"))) % 3 === i)
        .localCheckpoint())
    parts.zipWithIndex.foreach { case (p, i) =>
      p.coalesce(1).write.parquet(s"$tmp/src/up$i")
    }
    ExperimentStore.runExperimentStream(spark, s"$tmp/src/*",
      s"$tmp/store", s"$tmp/ckpt", parts.head.schema, compactEvery = 2)
      .awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val all = events
    val checks: Seq[(String, () => Seq[String], Seq[String])] = Seq(
      ("ab", () => rows(ExperimentStore.abView(spark, s"$tmp/store")),
        rows(AbTest.abTest(all))),
      ("mw", () =>
        rows(ExperimentStore.mannWhitneyView(spark, s"$tmp/store")),
        rows(AbTest.mannWhitney(all))),
      // round 14 session 5: Cliff's delta rides the same rank state;
      // Nelson-Aalen the same clock lattice as kmView
      ("cliffs", () =>
        rows(ExperimentStore.cliffsDeltaView(spark, s"$tmp/store")),
        rows(AbTest.cliffsDelta(all))),
      ("bayes", () =>
        rows(ExperimentStore.bayesView(spark, s"$tmp/store")),
        rows(graft.operators.BayesAb.bayesAb(all))),
      ("odds", () =>
        rows(ExperimentStore.oddsView(spark, s"$tmp/store")),
        rows(graft.operators.OddsRatio.oddsRatio(all))),
      ("balance", () =>
        rows(ExperimentStore.balanceView(spark, s"$tmp/store")),
        rows(graft.operators.CovariateBalance.covariateBalance(all))),
      ("ks", () =>
        rows(ExperimentStore.ksView(spark, s"$tmp/store")),
        rows(graft.operators.KsAb.ksAb(all))),
      ("rate", () =>
        rows(ExperimentStore.rateRatioView(spark, s"$tmp/store")),
        rows(graft.operators.RateRatio.rateRatio(all))),
      ("medsurv", () =>
        rows(ExperimentStore.medianSurvivalView(spark, s"$tmp/store")),
        rows(graft.operators.MedianSurvival.survivalQuantiles(
          graft.operators.KaplanMeier.timeToBigPurchase(all)))),
      ("nelson", () =>
        rows(ExperimentStore.nelsonAalenView(spark, s"$tmp/store")),
        rows(graft.operators.NelsonAalen.hazardTable(
          graft.operators.KaplanMeier.timeToBigPurchase(all)))),
      ("cuped", () => rows(ExperimentStore.cupedView(spark, s"$tmp/store")),
        rows(Cuped.cuped(all))),
      ("did", () => rows(ExperimentStore.didView(spark, s"$tmp/store")),
        rows(DiffInDiff.didTest(all))),
      ("perm", () =>
        rows(ExperimentStore.permTestView(spark, s"$tmp/store")),
        rows(PermTest.permTest(all))),
      ("sprt", () => rows(ExperimentStore.sprtView(spark, s"$tmp/store")),
        rows(Sprt.sprt(all))),
      ("srm", () => rows(ExperimentStore.srmView(spark, s"$tmp/store")),
        rows(SrmMde.srmCheck(all))),
      ("mde", () => rows(ExperimentStore.mdeView(spark, s"$tmp/store")),
        rows(SrmMde.mdePower(all))),
      ("trimmed", () =>
        rows(ExperimentStore.trimmedView(spark, s"$tmp/store")),
        rows(RobustEffects.trimmedAb(all))),
      ("qte", () => rows(ExperimentStore.qteView(spark, s"$tmp/store")),
        rows(RobustEffects.qte(all))),
      ("strat", () => rows(ExperimentStore.stratView(spark, s"$tmp/store")),
        rows(StratEffect.stratEffect(all))),
      ("lorenz", () =>
        rows(ExperimentStore.lorenzView(spark, s"$tmp/store")),
        rows(graft.operators.Lorenz.lorenzGini(all))),
      ("rfm", () => rows(ExperimentStore.rfmView(spark, s"$tmp/store")),
        rows(graft.operators.Rfm.rfm(all))),
      // round 14: the group-sequential looks ride the same per-user
      // delta as K schedule-parameterized sum columns
      ("groupseq", () =>
        rows(ExperimentStore.groupSeqView(spark, s"$tmp/store")),
        rows(GroupSeq.groupSeq(all))),
      // round 14 session 4: qini rides the existing sums; shapley the
      // per-channel single-bit MAX lattices (bit-OR across batches)
      ("qini", () => rows(ExperimentStore.qiniView(spark, s"$tmp/store")),
        rows(graft.operators.Uplift.qiniFromPerUser(
          graft.operators.Uplift.perUserUplift(all)))),
      ("shapley", () =>
        rows(ExperimentStore.shapleyView(spark, s"$tmp/store")),
        rows(graft.operators.ShapleyAttrib.shapleyChannels(all))),
      ("offpolicy", () =>
        rows(ExperimentStore.offPolicyView(spark, s"$tmp/store")),
        rows(graft.operators.OffPolicy.offPolicyFromPerUser(
          graft.operators.OffPolicy.perUserLogged(all)))))
    checks.foreach { case (name, live, batch) =>
      assert(live() === batch, s"live $name view != batch")
    }
    // replay the newest (un-compacted) batch: same delta dir rewritten
    ExperimentStore.appendExperimentBatch(spark,
      spark.read.parquet(s"$tmp/src/up2"), s"$tmp/store", 2L)
    checks.foreach { case (name, live, batch) =>
      assert(live() === batch, s"$name after replay")
    }
    // explicit compaction of everything committed: views unchanged
    ExperimentStore.store(s"$tmp/store").compact(spark, 2L)
    checks.foreach { case (name, live, batch) =>
      assert(live() === batch, s"$name after compaction")
    }
  }

  test("the sequential walk updates as later batches flip conversions") {
    val tmp = java.nio.file.Files.createTempDirectory("expstore2")
      .toFile.getAbsolutePath
    // batch 0: only the FIRST half of each user's purchases (by event
    // id parity) — many users sit below convMin; batch 1 completes
    // them. The walk after batch 1 must equal the batch test on the
    // full log, i.e. y is re-derived from merged state, not frozen.
    val half0 = events.filter(col("event_id") % 2 === 0).localCheckpoint()
    ExperimentStore.appendExperimentBatch(spark, half0, s"$tmp/store", 0L)
    val afterHalf = ExperimentStore.sprtView(spark, s"$tmp/store")
      .collect().map(_.toString).toSeq.sorted
    assert(afterHalf === Sprt.sprt(half0).collect()
      .map(_.toString).toSeq.sorted)
    val half1 = events.filter(col("event_id") % 2 === 1).localCheckpoint()
    ExperimentStore.appendExperimentBatch(spark, half1, s"$tmp/store", 1L)
    val afterAll = ExperimentStore.sprtView(spark, s"$tmp/store")
      .collect().map(_.toString).toSeq.sorted
    assert(afterAll === Sprt.sprt(events).collect()
      .map(_.toString).toSeq.sorted)
    assert(afterAll !== afterHalf) // the walk genuinely moved
  }
}
