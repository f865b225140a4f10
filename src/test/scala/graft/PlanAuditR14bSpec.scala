package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape asserts for the round-14 session-5 wave (the
  * [[PlanAuditR14Spec]] posture): scan multiplicity pinned on the
  * OPTIMIZED logical plan, window partitioning on the physical
  * tree. Multi-consumer bounded tables must be checkpointed — their
  * corpus scan happens once at materialization, so the final plan
  * holds ZERO source relations. */
class PlanAuditR14bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def scanCount(name: String): Int =
    SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      .collect {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation => 1
      }.sum

  private def globalWindows(name: String) =
    planOf(name).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  test("one-scan shapes scan once") {
    assert(scanCount("q_readability") === 1)
    assert(scanCount("q_chao_richness") === 1)
    assert(scanCount("q_mcnemar") === 1)
    assert(scanCount("q_bayes_ab") === 1)
    assert(scanCount("q_odds_ratio") === 1)
    assert(scanCount("q_covariate_balance") === 1)
    assert(scanCount("q_extreme_value") === 1)
  }

  test("checkpointed multi-consumer tables leave zero relations") {
    assert(scanCount("q_chi2_assoc") === 0)
    assert(scanCount("q_fightin_words") === 0)
    assert(scanCount("q_l_diversity") === 0)
    assert(scanCount("q_runs_test") === 0)
    assert(scanCount("q_textrank") === 0)
  }

  test("spine/probe families stay within their documented scan bounds") {
    // the dense-spine pattern pays two rollup passes (Autocorr shape)
    assert(scanCount("q_double_ewma") <= 2)
    assert(scanCount("q_forecast_eval") <= 2)
    assert(scanCount("q_stl_decompose") <= 2)
    // KM risk table: groups feeds tot + cross join (existing shape)
    assert(scanCount("q_nelson_aalen") <= 2)
    assert(scanCount("q_median_survival") <= 2)
    // hubness: probe leg + corpus count off the checkpointed occ
    assert(scanCount("q_hubness") <= 3)
  }

  test("per-probe/per-type windows are never global") {
    assert(globalWindows("q_hubness").isEmpty,
      "top-k rank must partition by probe")
    assert(globalWindows("q_double_ewma").isEmpty)
    assert(globalWindows("q_runs_test").isEmpty)
    assert(globalWindows("q_stl_decompose").isEmpty)
    // (nelson-aalen's cumulative IS unpartitioned — the documented
    // duration-domain-bounded exemption; AQE hides it inside a query
    // stage, so there is no physical-tree assert for it here. The
    // scan-bound test above pins its real claim.)
  }
}
