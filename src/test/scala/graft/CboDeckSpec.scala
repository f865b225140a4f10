package graft

import org.apache.spark.sql.execution.ExplainMode

/** Round-16 ask #6: COST-BASED evidence on the relational deck. The
  * deck normally rides AQE + broadcast heuristics; at 100 TB the risk
  * is join ORDER once dims stop being auto-broadcastable. This spec
  * builds CATALOG tables over the 100× ScaleCheck corpus (temp views
  * cannot hold stats), runs ANALYZE ... FOR COLUMNS on the join/filter
  * columns, enables CBO + join reorder, DISABLES auto-broadcast
  * entirely, and pins that q05/q07/q09 — the 5-to-9-relation chains —
  * still plan pure hash-join machinery with each fact scanned exactly
  * once and statistics propagated to the root. A dedicated session
  * isolates the conf flips and the table namespace from concurrently
  * running suites (catalog tables are EXTERNAL — dropping them never
  * touches the corpus files). */
class CboDeckSpec extends SparkSpec {

  private val tables =
    Seq("lineitem", "orders", "customer", "supplier",
      "nation", "region", "part")

  /** Deck text with every base table qualified into the stats-bearing
    * database (qualified names bypass temp-view resolution, so the
    * rewrite is safe whatever other suites registered). */
  private def qualify(sql: String): String =
    sql.replaceAll(s"\\b(${tables.mkString("|")})\\b", "cbo_check.$1")

  test("100x dir + column stats + no auto-broadcast: q05/q07/q09 keep " +
    "single-scan hash-join plans under CBO join reorder") {
    val d = Seq("/tmp/sfbig100", "/tmp/sfbig10")
      .find(p => new java.io.File(s"$p/lineitem.parquet").exists)
    assume(d.nonEmpty, "no ScaleCheck corpus on this host")
    val s2 = spark.newSession()
    // .stats / plan phases read SQLConf.get (thread-local active
    // session); each s2.sql(...) restores the PREVIOUS active session
    // on exit, so pin s2 active for the whole block or the CBO flags
    // silently read the shared session's conf
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    s2.sql("CREATE DATABASE IF NOT EXISTS cbo_check")
    try {
      tables.foreach { t =>
        s2.sql(s"DROP TABLE IF EXISTS cbo_check.$t")
        s2.sql(s"CREATE TABLE cbo_check.$t USING parquet " +
          s"LOCATION '${d.get}/$t.parquet'")
      }
      // Join keys + pushable filter columns only — the stats CBO's
      // reorder and build-side choices actually read. The TIMESTAMP
      // columns (l_shipdate, o_orderdate) are deliberately ABSENT:
      // they are TIMESTAMP_NTZ in this corpus, and Spark 4.1's
      // FilterEstimation.evaluateBinary has no case for
      // TimestampNTZType — column stats on an NTZ column make any
      // CBO-estimated filter over it throw
      // scala.MatchError: TimestampNTZType (FilterEstimation.scala:281)
      // inside the optimizer. Without the column stats the estimator
      // falls back to default selectivity and planning proceeds. This
      // is exactly the dialect-discipline bug class DialectEdgeSpec
      // sweeps for, surfaced here in the ENGINE's own CBO.
      Map(
        "lineitem" -> "l_orderkey, l_partkey, l_suppkey",
        "orders" -> "o_orderkey, o_custkey",
        "customer" -> "c_custkey, c_nationkey, c_mktsegment",
        "supplier" -> "s_suppkey, s_nationkey",
        "nation" -> "n_nationkey, n_regionkey, n_name",
        "region" -> "r_regionkey, r_name",
        "part" -> "p_partkey, p_name, p_type"
      ).foreach { case (t, cols) =>
        s2.sql(s"ANALYZE TABLE cbo_check.$t COMPUTE STATISTICS " +
          s"FOR COLUMNS $cols")
      }
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // ANALYZE really landed: exact row counts visible to the planner
      val liRows = s2.table("cbo_check.lineitem")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(liRows.exists(_.toLong > 0L), s"lineitem rowCount $liRows")

      Seq("q_tpch_q05" -> 5, "q_tpch_q07" -> 5, "q_tpch_q09" -> 4)
        .foreach { case (name, joins) =>
          val qe = s2.sql(qualify(graft.operators.TpchDeck.sql(name)))
            .queryExecution
          val plan = qe.explainString(ExplainMode.fromString("formatted"))
          // machinery: hash joins only, even with zero broadcasts
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name planned a BNLJ without broadcastable dims:\n$plan")
          assert(!plan.contains("CartesianProduct"),
            s"$name planned a cartesian:\n$plan")
          assert(!plan.contains("BroadcastHashJoin"),
            s"$name still broadcasting with threshold -1")
          val hashJoins =
            "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size
          assert(hashJoins >= joins,
            s"$name lost join machinery: $hashJoins hash joins\n$plan")
          // reorder must not duplicate the fact: ONE lineitem scan
          val liScans = "lineitem".r.findAllIn(plan).size
          assert(liScans >= 1 && plan.split("Scan parquet")
            .count(_.contains("lineitem.parquet")) == 1,
            s"$name scans lineitem more than once:\n$plan")
          // CBO propagated stats to the root (join reorder had costs)
          assert(qe.optimizedPlan.stats.sizeInBytes > 0)
        }
    } finally {
      tables.foreach(t => s2.sql(s"DROP TABLE IF EXISTS cbo_check.$t"))
      s2.sql("DROP DATABASE IF EXISTS cbo_check")
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
