package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TAIL-RISK READOUT — exact Value-at-Risk and Conditional
  * Value-at-Risk (expected shortfall; Rockafellar & Uryasev 2000) of
  * per-user spend at p = [[tailQ]]: "how bad are the worst 5% of
  * user-level exposures, exactly?" — the risk discipline's pair to the
  * central-tendency readouts (trimmed means, quantiles) the suite
  * already ships. VaR alone hides everything past the cut; CVaR is
  * the coherent tail mean auditors actually want.
  *
  * EXACT, NOT SKETCHED: m = n − ⌊p·n⌋ is the tail size; VaR is the
  * m-th largest per-user value (an exact order statistic) and CVaR
  * averages the top m with the boundary TIE GROUP split exactly —
  * Σ_{v > VaR} v·cnt + VaR·(m − count above) — so the result is a
  * pure integer function of the data, hash-replayable.
  *
  * SCALE — the [[graft.operators.AbTest.qMannWhitney]] shape: one
  * scan → per-user cents → a per-VALUE group table (score-domain-
  * bounded), [[PrefixSum]]'s range-partitioned running count over the
  * DESCENDING value order (never a single-partition window), then the
  * boundary group and both tail sums are bounded aggregates with a
  * broadcast 1-row cut. Tail masses ride DECIMAL(38,0)/HUGEINT. */
object TailRisk {

  /** Tail probability: VaR/CVaR of the worst (1 − tailQ) fraction. */
  val tailQ = 0.95

  def tailRiskFromPerUser(pu: DataFrame): DataFrame = {
    val groups = pu.groupBy("cents").agg(count(lit(1)).as("cnt"))
    val (run, release) = {
      val t = PrefixSum.withRunningTotalTracked(
        groups, Seq(col("cents").desc), "cnt", "cumdesc")
      (t.df, () => t.checkpoint.unpersist(blocking = false))
    }
    try {
      // m = n − floor(q·n), exact in integers: floor(q·n) =
      // (n·95) div 100 for q = 0.95
      val nRow = groups.agg(sum(col("cnt")).as("n_users"))
        .selectExpr("n_users",
          "n_users - (n_users * 95) div 100 as tail_n")
      // COALESCE pins the aggregate non-nullable on both engines (a
      // nullable MAX comes back as float64 through the oracle's
      // pandas bridge and fails the dtype-sensitive hash)
      val v = run.crossJoin(broadcast(nRow))
        .filter(col("cumdesc") >= col("tail_n"))
        .agg(coalesce(max(col("cents")), lit(0L)).as("var_cents"))
      val out = run.crossJoin(broadcast(v))
        .filter(col("cents") > col("var_cents"))
        .agg(
          coalesce(sum(col("cents").cast(DecimalType(38, 0))
            * col("cnt")), lit(0).cast(DecimalType(38, 0)))
            .as("above_sum"),
          coalesce(sum(col("cnt")), lit(0L)).as("above_n"))
        .crossJoin(broadcast(v))
        .crossJoin(broadcast(nRow))
        .selectExpr("n_users", "tail_n", "var_cents",
          """cast(above_sum + cast(var_cents as decimal(38,0))
            | * (tail_n - above_n) as bigint)
            | as tail_sum_cents""".stripMargin.replace("\n", " "))
        .selectExpr("n_users", "tail_n", "var_cents", "tail_sum_cents",
          """case when tail_n = 0 then 0L else
            | cast(round(1000000.0 * cast(tail_sum_cents as double)
            |   / cast(tail_n as double)) as bigint)
            | end as cvar_cents_micro""".stripMargin.replace("\n", " "))
        // the 1-row result must outlive the released checkpoint
        .localCheckpoint()
      out
    } finally release()
  }

  def qTailRisk(spark: SparkSession, dir: String): DataFrame =
    tailRiskFromPerUser(AbTest.perUserArm(Tables(spark, dir, "events"))
      .select("user_id", "cents"))

  val qTailRiskSql: String =
    """WITH pu AS MATERIALIZED (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase'
      |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
      |      AS cents
      |  FROM events GROUP BY user_id),
      |groups AS (
      |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM pu GROUP BY cents),
      |run AS (
      |  SELECT cents, cnt,
      |    SUM(cnt) OVER (ORDER BY cents DESC
      |      ROWS UNBOUNDED PRECEDING) AS cumdesc
      |  FROM groups),
      |nn AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_users,
      |    CAST(SUM(cnt) - (SUM(cnt) * 95) // 100 AS BIGINT) AS tail_n
      |  FROM groups),
      |v AS (
      |  SELECT CAST(COALESCE(MAX(cents), 0) AS BIGINT) AS var_cents
      |  FROM run CROSS JOIN nn WHERE cumdesc >= tail_n),
      |above AS (
      |  SELECT COALESCE(SUM(CAST(cents AS HUGEINT) * cnt), 0)
      |      AS above_sum,
      |    CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS above_n
      |  FROM run CROSS JOIN v WHERE cents > var_cents)
      |SELECT n.n_users, n.tail_n, v.var_cents,
      |  CAST(a.above_sum + CAST(v.var_cents AS HUGEINT)
      |    * (n.tail_n - a.above_n) AS BIGINT) AS tail_sum_cents,
      |  CASE WHEN n.tail_n = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0
      |      * CAST(a.above_sum + CAST(v.var_cents AS HUGEINT)
      |          * (n.tail_n - a.above_n) AS DOUBLE)
      |      / CAST(n.tail_n AS DOUBLE)) AS BIGINT)
      |    END AS cvar_cents_micro
      |FROM above a CROSS JOIN v CROSS JOIN nn n""".stripMargin
}
