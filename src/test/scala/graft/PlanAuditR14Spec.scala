package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape asserts for the round-14 session-4 wave — each
  * scaladoc's `.explain` claim pinned on the physical tree (the
  * [[PlanAuditR13Spec]] posture): scan counts, window partitioning,
  * broadcast shapes. */
class PlanAuditR14Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  /** Source-relation count on the OPTIMIZED logical plan — exact scan
    * multiplicity, immune to AQE's initial-plus-current double print
    * that inflates a regex over executedPlan.toString. */
  private def scanCount(name: String): Int =
    SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      .collect {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation => 1
      }.sum

  private def globalWindows(name: String) =
    planOf(name).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  test("one-scan queries really scan their table once") {
    // fd profile: the |candidates| battery rides ONE orders scan
    // (explode fan-out, not per-candidate rescans)
    assert(scanCount("q_fd_discover") === 1)
    // off-policy: all three policies in ONE aggregate over one scan
    assert(scanCount("q_offpolicy_eval") === 1)
    // shapley/anova: the bounded stat table is CHECKPOINTED (the one
    // corpus scan happens at its materialization), so the final plan
    // holds zero source relations — multi-consumer re-scans would
    // show up as > 0 here
    assert(scanCount("q_shapley_channels") === 0)
    assert(scanCount("q_anova") === 0)
  }

  test("qini never uses an unpartitioned window (two-level row number)") {
    assert(globalWindows("q_qini").isEmpty,
      "qini must ride RowNumbering's scalable rank")
  }

  test("burstiness gap windows partition by (user, type)") {
    assert(globalWindows("q_burstiness").isEmpty,
      "inter-arrival lag must be partitioned, never a global sort")
    assert(scanCount("q_burstiness") <= 3) // fano + gaps + 1-row span
  }

  test("xcorr/granger: at most the spine pattern's two corpus passes") {
    // the dense-spine pattern pays TWO passes (bounds probe + the
    // rollup the spine joins back to — the Autocorr shape); the lag
    // windows ARE unpartitioned by the documented calendar-bounded
    // exemption, so the assert here is the scan bound
    assert(scanCount("q_xcorr") <= 2)
    assert(scanCount("q_granger") <= 2)
  }

  test("t-closeness: the checkpointed histogram keeps the corpus at one scan") {
    // scan happens once at histogram materialization; the final plan
    // reads only the checkpointed RDD
    assert(scanCount("q_t_closeness") === 0)
    assert(globalWindows("q_t_closeness").isEmpty,
      "the cumulative sweep partitions by class")
  }

  test("hits: normalizers broadcast; the shapley coalition sweep broadcasts") {
    assert(planOf("q_hits").toString.contains("BroadcastExchange"),
      "1-row normalizer should broadcast into the node re-anchor")
    assert(planOf("q_shapley_channels").toString
      .contains("BroadcastExchange") ||
      planOf("q_shapley_channels").toString
        .contains("BroadcastNestedLoopJoin"),
      "16-row game frames should broadcast")
  }
}
