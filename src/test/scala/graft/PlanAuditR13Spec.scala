package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape asserts for the round-13 wave — the `.explain` claims
  * each scaladoc makes, pinned so a regression that silently adds a
  * scan, a global window, or an un-broadcast join fails here rather
  * than surfacing as a 100 TB incident. Windows are inspected on the
  * physical tree (WindowExec.partitionSpec), not plan text. */
class PlanAuditR13Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def assertNoGlobalWindow(name: String): Unit = {
    val globals = planOf(name).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"$name: ${globals.size} unpartitioned Window(s):\n" +
        globals.map(_.toString).mkString("\n"))
  }

  test("one-scan sufficient-statistic queries really scan events once") {
    Seq("q_ab_test", "q_srm_check", "q_mde_power", "q_group_seq")
      .foreach { q =>
        val scans =
          "FileScan|Scan parquet".r.findAllIn(planOf(q).toString).size
        assert(scans === 1, s"$q: expected exactly 1 scan, saw $scans")
      }
    // strat_effect's 1-row max broadcast legitimately re-reads once
    Seq("q_strat_effect", "q_did_test").foreach { q =>
      val scans =
        "FileScan|Scan parquet".r.findAllIn(planOf(q).toString).size
      assert(scans <= 2, s"$q: expected at most 2 scans, saw $scans")
    }
  }

  test("rank-substrate and probe-window queries never use an " +
    "unpartitioned window") {
    // trimmed/QTE/Mann-Whitney ride PrefixSum's range-partitioned
    // running totals; KNN-Shapley's rank/suffix windows partition by
    // probe — the single-partition Window trap must not reappear
    Seq("q_trimmed_ab", "q_qte", "q_mann_whitney", "q_knn_shapley")
      .foreach(assertNoGlobalWindow)
  }

  test("KNN-Shapley's probe side broadcasts") {
    val plan = planOf("q_knn_shapley").toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "probe table should broadcast")
  }

  test("the serving classifier's inference is whole-stage-codegen " +
    "map work") {
    val docs = Tables(spark, dir, "documents")
    val model = graft.ext.CorpusOps.trainClassifier(docs)
    val plan = graft.ext.CorpusOps.classifyWith(docs, model.weights)
      .queryExecution.executedPlan.toString
    // executedPlan.toString marks whole-stage-codegen stages "*(n)"
    assert(plan.contains("*("),
      "inference fold should be codegen'd")
    assert(!plan.contains("Exchange"),
      "inference must be map-only (no shuffle)")
  }
}
