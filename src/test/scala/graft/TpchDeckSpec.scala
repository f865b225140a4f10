package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan + execution audit for the round-15 decision-support deck
  * ([[graft.operators.TpchDeck]]): every correlated / EXISTS / IN
  * subquery shape must decorrelate to hash-join machinery — the
  * formatted plan (which includes every subquery's physical plan) may
  * contain NO BroadcastNestedLoopJoin and NO CartesianProduct — and
  * each query must actually execute. Row-value correctness is the
  * driver gate's job (the DuckDB oracle runs the identical SQL text);
  * this spec pins the PLANS, which the oracle can't see. */
class TpchDeckSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** Formatted explain covers the main plan AND all subquery plans
    * (scalar subqueries execute as separate SubqueryExec trees that a
    * walk over executedPlan alone would miss). */
  private def formattedPlan(name: String): String =
    df(name).queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("no nested-loop or cartesian machinery anywhere in the deck") {
    graft.operators.TpchDeck.sql.keys.foreach { name =>
      val plan = formattedPlan(name)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name planned a BroadcastNestedLoopJoin:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a CartesianProduct:\n$plan")
    }
  }

  test("subquery shapes really decorrelated into semi/anti hash joins") {
    // EXISTS → LeftSemi, NOT EXISTS → LeftAnti, NOT IN → null-aware
    // anti (single-column NAAJ rides BroadcastHashJoin). The formatted
    // text carries the join type next to the hash-join node.
    assert(formattedPlan("q_tpch_q04").contains("LeftSemi"))
    val q21 = formattedPlan("q_tpch_q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"))
    assert(formattedPlan("q_tpch_q16").contains("LeftAnti"))
    assert(formattedPlan("q_tpch_q18").contains("LeftSemi"))
    assert(formattedPlan("q_tpch_q22").contains("LeftAnti"))
  }

  test("date/segment predicates reach the parquet scans") {
    // Q3's three single-table predicates must all push to their scans
    // — at 100 TB this is the difference between scanning the filtered
    // fraction and scanning everything.
    val q3 = formattedPlan("q_tpch_q03")
    assert(q3.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || q3.contains("EqualTo(c_mktsegment,BUILDING)"), q3)
    assert(q3.contains("LessThan(o_orderdate,"), q3)
    assert(q3.contains("GreaterThan(l_shipdate,"), q3)
    // Q6: all four single-table predicates reach the lineitem scan
    val q6 = formattedPlan("q_tpch_q06")
    assert(q6.contains("GreaterThanOrEqual(l_shipdate,"), q6)
    assert(q6.contains("GreaterThanOrEqual(l_discount,"), q6)
    assert(q6.contains("LessThan(l_quantity,"), q6)
  }

  test("Q13's filtered LEFT OUTER keeps zero-order customers") {
    val q13 = formattedPlan("q_tpch_q13")
    assert(q13.contains("LeftOuter"), q13)
    // every customer appears in exactly one c_count bucket
    Tables.registerAll(spark, dir)
    val total = df("q_tpch_q13").agg(org.apache.spark.sql.functions
      .sum("custdist")).head().getLong(0)
    assert(total === spark.table("customer").count())
  }

  test("every deck query executes (sf0.001), LIMIT'd ones within bound") {
    val counts = graft.operators.TpchDeck.sql.keys.map { name =>
      name -> df(name).count()
    }.toMap
    // limits hold
    assert(counts("q_tpch_q03") <= 10)
    assert(counts("q_tpch_q10") <= 20)
    assert(counts("q_tpch_q18") <= 100)
    assert(counts("q_tpch_q21") <= 25)
    // shapes with guaranteed sf0.001 support produce rows
    Seq("q_tpch_q02", "q_tpch_q03", "q_tpch_q04", "q_tpch_q06",
      "q_tpch_q08", "q_tpch_q09", "q_tpch_q10", "q_tpch_q12",
      "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16",
      "q_tpch_q17", "q_tpch_q19", "q_tpch_q21", "q_tpch_q22")
      .foreach { n =>
        assert(counts(n) > 0, s"$n returned no rows at sf0.001")
      }
  }

  test("Q15 keeps ALL max-revenue ties (exact-integer total)") {
    val rows = df("q_tpch_q15").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1, "every surviving supplier shares the max")
  }

  test("scaled corpora keep the same join machinery (no BNLJ/cartesian)") {
    // the 100 TB claim is that the plans don't flip to nested-loop
    // machinery when the facts grow; check against whatever ScaleCheck
    // corpora exist on this host (cancelled cleanly when none do)
    val dirs = Seq("/tmp/sfbig10", "/tmp/sfbig100")
      .filter(d => new java.io.File(s"$d/lineitem.parquet").exists)
    assume(dirs.nonEmpty, "no ScaleCheck corpus on this host")
    dirs.foreach { d =>
      graft.operators.TpchDeck.sql.keys.foreach { name =>
        val plan = SparkEntry.queries(name)(spark, d).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name flipped to BNLJ at $d")
        assert(!plan.contains("CartesianProduct"),
          s"$name flipped to cartesian at $d")
      }
    }
  }

  test("round-16: Q18/Q21 runtime filters — bloom probe in the plan, " +
    "semi/anti machinery intact, rows identical to the shared text") {
    Tables.registerAll(spark, dir)
    Seq("q_tpch_q18", "q_tpch_q21").foreach { name =>
      val plan = formattedPlan(name)
      // the manual runtime filter is really in the plan, upstream of
      // the joins (BloomFilterMightContain renders as might_contain)
      assert(plan.contains("might_contain"),
        s"$name lost its bloom runtime filter:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), name)
      // row-for-row equivalence with the UNCHANGED oracle text: the
      // bloom only prunes rows the exact joins would drop anyway
      val rf = df(name).collect().map(_.toString).toSeq
      val ref = spark.sql(graft.operators.TpchDeck.sql(name))
        .collect().map(_.toString).toSeq
      assert(rf === ref, s"$name runtime-filtered rows diverge")
    }
    assert(formattedPlan("q_tpch_q21").contains("LeftSemi") &&
      formattedPlan("q_tpch_q21").contains("LeftAnti"))
    assert(formattedPlan("q_tpch_q18").contains("LeftSemi"))
  }

  test("Q17 correlated AVG: only sub-threshold quantities contribute") {
    // recompute the per-part 0.2·avg thresholds directly and replay
    // the sum — pins the decorrelated join's semantics, not just rows>0
    Tables.registerAll(spark, dir)
    val expect = spark.sql(
      """SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/7.0 AS avg_yearly
        |FROM lineitem l
        |JOIN part ON p_partkey = l.l_partkey
        |JOIN (SELECT l_partkey pk, 0.2*AVG(l_quantity) thr
        |      FROM lineitem GROUP BY l_partkey) t ON t.pk = l.l_partkey
        |WHERE p_brand = 'Brand#5' AND p_type = 'ECONOMY'
        |  AND l.l_quantity < t.thr""".stripMargin).collect().head
    val got = df("q_tpch_q17").collect().head
    assert(got.getAs[Double]("avg_yearly") === expect.getAs[Double]("avg_yearly"))
  }
}
